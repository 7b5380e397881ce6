package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up generator: replicate the driver fixture ×N with
  * perturbed keys, so the scale-exponent check (scripts/scale_check.py)
  * can measure the heaviest keys ABOVE Spark's fixed job floor — the r7
  * verdict's top item ("the r7 table is overhead-bound, proving nothing
  * about the data-proportional term").
  *
  *   sbt "runMain graft.ScaleGen /root/testdata/sf0.1 target/scaledata/sf1 10"
  *
  * Replication is keyed so WORK scales linearly where the operator's
  * semantics are linear, and only grows faster where the declared output
  * itself does (which the adjudication table in BASELINE.md then has to
  * call out, not hide):
  *
  *  - dims (region/nation) copy as-is — FK targets stay valid;
  *  - fact keys shift by `replica × stride` (stride = max key + 1), so
  *    replica r's orders reference replica r's customers and lineitem
  *    baskets/groups keep their ORIGINAL sizes — a group-quadratic plan
  *    (C(k,2) basket explode, per-group window) sees 10× more groups of
  *    the same size, never 10×-bigger groups;
  *  - `documents.text` tags every token with the replica id (`tok~r`),
  *    making replica shingle vocabularies disjoint: near-dup pairs exist
  *    only within a replica, so the true pair set grows ×N (linear),
  *    not ×N² (which identical copies would force — at which point the
  *    measurement would grade the OUTPUT's quadratic growth, not the
  *    plan's). Shingle df per replica is unchanged — posting-list
  *    group sizes hold, posting count grows ×N;
  *  - `embeddings` get a deterministic ±1e-3 sin perturbation per
  *    replica (no RNG — reruns are bit-identical) so no two replicas
  *    are exact duplicates of one vector.
  *
  * Everything is one declarative plan per table: broadcast the N-row
  * replica range, crossJoin (explicitly a broadcast nested loop over a
  * tiny side — the one legitimate crossJoin shape), project perturbed
  * columns, write. No driver-side loops over data. */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse(s"${sys.props("user.dir")}/target/scaledata/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, out, factor)
    spark.stop()
  }

  /** Session-injected core (ScaleGenSpec drives it on the shared test
    * session; main owns session lifecycle). */
  def run(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    Tables.configure(spark)

    val replicas = broadcast(
      spark.range(factor.toLong).select(col("id").cast("long").as("r")))

    /** Replicate `df` ×factor, shifting each column in `keyCols` by
      * r × (max(col) + 1) — strides computed in one tiny agg. */
    def replicate(df: DataFrame, keyCols: Seq[String]): DataFrame = {
      val strides: Map[String, Long] =
        if (keyCols.isEmpty) Map.empty
        else {
          val row = df.agg(max(col(keyCols.head)),
                           keyCols.tail.map(c => max(col(c))): _*).collect()(0)
          keyCols.zipWithIndex.map { case (c, i) => c -> (row.getLong(i) + 1L) }.toMap
        }
      // keep `r` so callers can derive replica-dependent columns; write()
      // drops it
      val rep = df.crossJoin(replicas)
      rep.select(col("r") +: df.columns.map {
        case c if strides.contains(c) => (col(c) + col("r") * strides(c)).as(c)
        case c => col(c)
      }.toSeq: _*)
    }

    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.drop("r").repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")

    val t0 = System.nanoTime()
    // dims: copy as-is (FK targets of *_nationkey / *_regionkey)
    write(spark.read.parquet(s"$src/region.parquet"), "region", 1)
    write(spark.read.parquet(s"$src/nation.parquet"), "nation", 1)

    write(replicate(spark.read.parquet(s"$src/customer.parquet"),
                    Seq("c_custkey")), "customer", 4)
    write(replicate(spark.read.parquet(s"$src/supplier.parquet"),
                    Seq("s_suppkey")), "supplier", 1)
    write(replicate(spark.read.parquet(s"$src/part.parquet"),
                    Seq("p_partkey")), "part", 4)
    write(replicate(spark.read.parquet(s"$src/orders.parquet"),
                    Seq("o_orderkey", "o_custkey")), "orders", 8)
    write(replicate(spark.read.parquet(s"$src/lineitem.parquet"),
                    Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem", 32)
    write(replicate(spark.read.parquet(s"$src/events.parquet"),
                    Seq("event_id", "user_id")), "events", 8)

    val docs = replicate(spark.read.parquet(s"$src/documents.parquet"),
                         Seq("doc_id"))
      // replica 0 keeps the original text; replicas tag every token so
      // their shingle vocabularies are disjoint from every other replica
      .withColumn("text", when(col("r") === 0, col("text")).otherwise(
        expr("concat_ws(' ', transform(split(text, ' '), " +
             "t -> concat(t, '~', CAST(r AS STRING))))")))
      .withColumn("n_chars", length(col("text")))
    write(docs, "documents", 8)

    val embs = replicate(spark.read.parquet(s"$src/embeddings.parquet"),
                         Seq("vec_id"))
      .withColumn("embedding", expr(
        // deterministic, replica-indexed jitter; r=0 stays bit-identical
        """transform(embedding, (x, j) ->
             CAST(x + CAST(r AS DOUBLE) * 1e-3 *
                  sin(CAST(vec_id AS DOUBLE) + CAST(j AS DOUBLE)) AS FLOAT))"""))
    write(embs, "embeddings", 4)

    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"scalegen":"done","src":"$src","out":"$out","factor":$factor,"sec":${math.round(sec)}}""")
  }
}
