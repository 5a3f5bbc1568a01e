package graft.core

import graft.operators.{Qualifier, Transformer}
import graft.sinks.{NoOpSink, Sink}
import graft.sources.Source
import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ListBuffer

/** How the flow ended — the reference's `FlowStatus`
  * (`src/Loaders/LoaderAbstract.php:61-87`): clean (ran to completion),
  * dirty (a break truncated the stream, `docs/callbacks.md:36-41`),
  * exception. */
sealed trait PipelineStatus
object PipelineStatus {
  case object Clean extends PipelineStatus
  case object Dirty extends PipelineStatus
  final case class Failed(error: Throwable) extends PipelineStatus
}

/** The reference's `getStats()` surface (`src/YaEtl.php:250-281`,
  * counters declared at `:38-53`), rebuilt from `Dataset.observe`
  * metrics — zero extra passes over the data. */
final case class PipelineReport(
    status: PipelineStatus,
    counters: Map[String, Long],
    durationMs: Long) {

  /** Formatted stats line — the reference's `getStats()` report
    * (`src/YaEtl.php:250-281`, template at `:254-258`; sample output
    * `docs/events.md:171-175`). */
  def pretty: String = {
    def total(prefix: String) =
      counters.collect { case (k, v) if k.startsWith(prefix) => v }.sum
    val state = status match {
      case PipelineStatus.Clean     => "clean"
      case PipelineStatus.Dirty     => "dirty"
      case PipelineStatus.Failed(_) => "exception"
    }
    s"[graft](${state}) ${total("extract")} extracted - " +
      s"${total("load")} loaded - ${counters.size} observation points - ${durationMs} ms"
  }
}

/** Spark-native analog of the reference's fluent flow builder
  * (`YaEtl extends NodalFlow`, verbs at `src/YaEtl.php:89-229`):
  * `from / join / qualify / transform / to / branch / exec`.
  *
  * The build phase only composes an immutable step list; [[exec]] folds
  * it into plain `DataFrame` lineage, so Catalyst plans the whole flow
  * (pushdown, pruning, join strategy) — the reference's record-at-a-time
  * pump (`README.md:9`) becomes whole-stage-codegen'd vectorized
  * execution with zero interpretation overhead per record.
  *
  * Scale notes:
  *  - Multiple sinks / branches share one lineage; the longest common
  *    prefix is persisted once (`README.md:38-45` multi-sink semantics
  *    without recomputation).
  *  - Like the reference, the grammar is closed (`src/YaEtl.php:123-126`
  *    forbids raw `add`): every verb maps to a plan Catalyst can reason
  *    about; there is no "run arbitrary code mid-flow" hole outside
  *    [[graft.operators.Transformers.Callable]].
  */
final class Pipeline private (private val steps: Vector[Pipeline.Step]) {
  import Pipeline._

  private def append(s: Step) = new Pipeline(steps :+ s)

  /** Add the (first) source — `src/YaEtl.php:89-99`. A second `from` with
    * `aggregate = true` concatenates sources like the reference's
    * `AggregateExtractor` (`src/Extractors/AggregateExtractor.php:22-63`):
    * same schema, presented downstream as one stream (`unionByName`). */
  def from(src: Source, aggregate: Boolean = false): Pipeline =
    append(From(src, aggregate))

  /** A non-aggregated second source: the reference re-triggers it per
    * upstream record ("categorized extract", `README.md:140-168`). The
    * relational rewrite is a join on the parameterizing key; with no key
    * it is a cross product (each upstream record fans out over the whole
    * second source — `tests/QualifierTest.php:292-296` cardinality). */
  def fromPerRecord(src: Source, on: Option[(String, String)] = None): Pipeline =
    append(FromPerRecord(src, on))

  /** Equi-join against a unique-keyed source — `src/YaEtl.php:166-176`. */
  def join(spec: JoinSpec): Pipeline = append(Join(spec))

  /** Per-record predicate — `src/YaEtl.php:108-114`. */
  def qualify(q: Qualifier): Pipeline = append(Qualify(q))
  def qualify(pred: Column): Pipeline = qualify(graft.operators.Qualifiers.Keep(pred))

  /** Per-record map — `src/YaEtl.php:187-193`. */
  def transform(t: Transformer): Pipeline = append(Transform(t))

  /** Add a sink. Multiple sinks per flow are legal, including mid-flow
    * (`README.md:38-45`; `tests/YaEtlTest.php:281-404` loader-mid-flow). */
  def to(sink: Sink): Pipeline = append(To(sink))

  /** Embed a sub-flow over the stream at this point — `src/YaEtl.php:223-229`.
    * Each branch is an independent qualify/transform/to chain on the shared
    * (persisted) head; reference branches cannot yield records back
    * (`docs/usage.md:45`) and neither do these. */
  def branch(build: Pipeline => Pipeline): Pipeline =
    append(Branch(build(Pipeline())))

  /** Compile the flow to a DataFrame without running it (the reference's
    * documented standalone/partial-flow reuse, `docs/reusability.md:3-34`). */
  def toDF(spark: SparkSession): DataFrame = compile(spark)._1

  /** Run the flow: execute every sink write, gather counters, report —
    * `exec()` in the reference (`tests/YaEtlTest.php:40`), repeatable.
    * `events` receives the reference's flow-lifecycle notifications
    * (start/progress/flush/success/fail — SURVEY §2.7). */
  def exec(spark: SparkSession,
      events: PipelineEvents = PipelineEvents.Silent): PipelineReport = {
    val t0 = System.nanoTime()
    val progress = new TaskProgressListener(events)
    spark.sparkContext.addSparkListener(progress)
    events.onStart()
    try {
      val (_, effective, observations, truncated) = compile(spark)
      val shared = effective.size > 1
      val persisted = ListBuffer.empty[DataFrame]
      try {
        effective.zipWithIndex.foreach { case ((d, sink), i) =>
          val toWrite = if (shared) { val p = d.persist(); persisted += p; p } else d
          sink.write(toWrite)
          events.onFlush(i)
        }
      } finally persisted.foreach(_.unpersist(blocking = false))
      val counters = observations.flatMap { case (name, obs) =>
        obs.get.map { case (k, v) =>
          s"$name.$k" -> v.asInstanceOf[Number].longValue() }
      }.toMap
      val report = PipelineReport(
        if (truncated) PipelineStatus.Dirty else PipelineStatus.Clean,
        counters, (System.nanoTime() - t0) / 1000000)
      events.onSuccess(report)
      report
    } catch {
      case e: Throwable =>
        events.onFail(e)
        PipelineReport(PipelineStatus.Failed(e), Map.empty, (System.nanoTime() - t0) / 1000000)
    } finally spark.sparkContext.removeSparkListener(progress)
  }

  /** Fold the step list into lineage. Returns (final df, sink writes in
    * declaration order, observation points, truncated?). */
  private def compile(spark: SparkSession)
    : (DataFrame, Seq[(DataFrame, Sink)], Seq[(String, Observation)], Boolean) = {
    var df: DataFrame = null
    val writes = ListBuffer.empty[(DataFrame, Sink)]
    val observations = ListBuffer.empty[(String, Observation)]
    var truncated = false
    var i = 0

    def observed(d: DataFrame, name: String): DataFrame = {
      val obs = new Observation(s"graft_${name}_$i")
      observations += name -> obs
      d.observe(obs, count(lit(1)).as("records"))
    }

    steps.foreach { step =>
      i += 1
      step match {
        case BaseDf(base) => df = base
        case From(src, agg) =>
          val loaded = observed(src.load(spark), s"extract_$i")
          df = if (df == null) loaded
          else if (agg) df.unionByName(loaded, allowMissingColumns = false)
          else throw new IllegalStateException(
            "second non-aggregated from(): use fromPerRecord (per-record semantics) or aggregate = true (concat)")
        case FromPerRecord(src, on) =>
          require(df != null, "fromPerRecord needs an upstream source")
          val right = src.load(spark)
          df = on match {
            case Some((l, r)) =>
              val joined = df.join(right, df(l) === right(r))
              if (l == r) joined.drop(right(r)) else joined
            case None => df.crossJoin(right)
          }
        case Join(spec)    => df = spec(spark, df)
        case Qualify(q)    => df = q(df); truncated ||= q.truncates
        case Transform(t)  => df = t(df)
        case To(sink)      => writes += ((observed(df, s"load_$i"), sink))
        case Branch(sub)   =>
          val (_, bwrites, bobs, btrunc) = sub.withBase(df).compile(spark)
          writes ++= bwrites
          observations ++= bobs
          truncated ||= btrunc
      }
    }
    require(df != null, "pipeline has no source (from)")
    // a flow without an explicit sink still executes (reference exec()
    // semantics) — drive it through a NoOp write so counters materialize
    if (writes.isEmpty) writes += ((observed(df, s"load_${i + 1}"), NoOpSink))
    (df, writes.toSeq, observations.toSeq, truncated)
  }

  private def withBase(base: DataFrame): Pipeline =
    new Pipeline(Pipeline.BaseDf(base) +: steps)
}

object Pipeline {
  def apply(): Pipeline = new Pipeline(Vector.empty)
  def from(src: Source): Pipeline = Pipeline().from(src)

  sealed private trait Step
  private final case class From(src: Source, aggregate: Boolean) extends Step
  private final case class FromPerRecord(src: Source, on: Option[(String, String)]) extends Step
  private final case class Join(spec: JoinSpec) extends Step
  private final case class Qualify(q: Qualifier) extends Step
  private final case class Transform(t: Transformer) extends Step
  private final case class To(sink: Sink) extends Step
  private final case class Branch(sub: Pipeline) extends Step
  private final case class BaseDf(df: DataFrame) extends Step
}
