package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._
import graft.queries.QueryHelpers.Q

/** Registry of driver-checked queries.
  *
  * Conventions for oracle (DuckDB) hash parity:
  *  - every computed column is aliased identically on both sides;
  *  - result rows carry an unambiguous ORDER BY on both sides;
  *  - double aggregates computed HERE (the oracle layer) use exact
  *    DECIMAL casts converted back to DOUBLE at the end, so the sum is
  *    associative and bitwise identical regardless of partitioning /
  *    evaluation order. Library operators sum plain f64 (quantizing
  *    inside the engine would corrupt generic callers — ADVICE r1);
  *    queries exercising those operators ROUND on both sides instead;
  *  - DuckDB integer SUMs are cast to BIGINT (they default to HUGEINT,
  *    which the driver's type-sensitive hash treats as a decimal).
  *
  * Storage note: the dedup/similarity/winnowing entries return frames
  * backed by an eager local checkpoint (see `PipelineCache.materialize`)
  * — consume the frame, then release its blocks with
  * `PipelineCache.free(df)`, as `Bench`/`Verify` do after every run;
  * otherwise each invocation pins executor storage for the JVM's
  * lifetime (the checkpointed result cannot be recomputed once freed).
  */
object Queries {

  /** The full registry: family files under graft/queries/ (split
    * r13 from the former 14k-line monolith), composed here. Family
    * membership is organizational only — ids stay globally unique
    * (checked below) and the driver surface (all/oracles) is
    * unchanged.
    */
  private val registry: Seq[Q] =
    SensorQueries.registry ++
    PromqlQueries.registry ++
    DedupQueries.registry ++
    SimilarityQueries.registry ++
    MultimodalQueries.registry ++
    TextQueries.registry ++
    SamplingQueries.registry ++
    GraphQueries.registry ++
    SketchQueries.registry ++
    ProfilingQueries.registry ++
    StreamingQueries.registry ++
    BehaviorQueries.registry ++
    StatsQueries.registry

  require(registry.map(_.name).distinct.length == registry.length,
    "duplicate query ids across family registries")

  lazy val all: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(x => x.name -> x.fn).toMap

  lazy val oracles: Map[String, String] =
    registry.flatMap(x => x.oracle.map(x.name -> _)).toMap
}
