package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §5.4 — algebraic properties over seeded random data (three
  * seeds × the laws; deterministic, no generator-library dependency). */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def randomKv(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((rnd.nextInt(20).toLong, rnd.nextInt(100), rnd.nextString(3)))
      .toDF("k", "v", "s")
  }

  for (seed <- Seq(1, 7, 42)) {
    test(s"dedup idempotence and survivor determinism (seed=$seed)") {
      val df = randomKv(seed, 500)
      val d1 = df.distinct()
      assert(d1.count() == d1.distinct().count())
      // min-aggregation survivor rule is deterministic across reruns
      val s1 = df.groupBy($"k").agg(min($"v")).collect().toSet
      val s2 = df.groupBy($"k").agg(min($"v")).collect().toSet
      assert(s1 == s2)
    }

    test(s"semi+anti partition the left side (seed=$seed)") {
      val a = randomKv(seed, 300)
      val b = randomKv(seed + 1000, 100).select($"k")
      val semi = a.join(b, Seq("k"), "left_semi").count()
      val anti = a.join(b, Seq("k"), "left_anti").count()
      assert(semi + anti == a.count())
      assert(a.join(b.distinct(), Seq("k"), "inner").count() == semi)
    }

    test(s"set-op algebra on key projections (seed=$seed)") {
      val a = randomKv(seed, 200).select($"k", $"v")
      val b = randomKv(seed + 1, 200).select($"k", $"v")
      assert(a.unionAll(b).count() == a.count() + b.count())
      val da = a.distinct()
      val inter = da.intersect(b).count()
      val ex = da.except(b).count()
      assert(inter + ex == da.count())
    }

    test(s"window row_number is a permutation of 1..n per partition (seed=$seed)") {
      val df = randomKv(seed, 400)
      val w = Window.partitionBy($"k").orderBy($"v", $"s")
      val rn = df.withColumn("rn", row_number().over(w))
      val bad = rn.groupBy($"k")
        .agg(count(lit(1)).as("n"), min($"rn").as("lo"), max($"rn").as("hi"),
             countDistinct($"rn").as("d"))
        .filter($"lo" =!= 1 || $"hi" =!= $"n" || $"d" =!= $"n")
      assert(bad.count() == 0)
    }
  }

  test("cosine bounds on random float vectors") {
    graft.functions.Custom.register(spark)
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(200)((Array.fill(16)(rnd.nextFloat * 4 - 2),
                            Array.fill(16)(rnd.nextFloat * 4 - 2)))
      .toDF("a", "b")
    val out = df.select(expr("cosine_sim(a, b)").as("c")).as[Double].collect()
    out.foreach(c => assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12, s"out of bounds: $c"))
  }
}
