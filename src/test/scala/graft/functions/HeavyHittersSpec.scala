package graft.functions

import graft.kernel.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  // skewed fixture: key k appears k times (keys 1..60, n = 1830)
  private def fixture = {
    import spark.implicits._
    (1 to 60).flatMap(k => Seq.fill(k)(k.toLong)).toDF("k").repartition(7)
  }

  test("capacity >= distinct keys: the sketch is exact regardless of partitioning") {
    import spark.implicits._
    val sketch = udaf(new HeavyHitters(128))
    val got = fixture.agg(sketch($"k").as("hh"))
      .select(explode($"hh").as(Seq("k", "cnt")))
      .as[(Long, Long)].collect().toMap
    val exact = (1 to 60).map(k => k.toLong -> k.toLong).toMap
    assert(got == exact)
  }

  test("capacity < distinct keys: counts underestimate by at most n/capacity; hot keys survive") {
    import spark.implicits._
    val cap = 16
    val n = 1830L
    val sketch = udaf(new HeavyHitters(cap))
    val got = fixture.agg(sketch($"k").as("hh"))
      .select(explode($"hh").as(Seq("k", "cnt")))
      .as[(Long, Long)].collect().toMap
    assert(got.size <= cap)
    got.foreach { case (k, est) =>
      assert(est <= k, s"key $k overestimated: $est > $k")
      assert(est >= k - n / cap, s"key $k underestimated past n/cap: $est < ${k - n / cap}")
    }
    // survival property needs a key hotter than n/cap (the first fixture's
    // max freq 60 is under its n/cap=114, so nothing is guaranteed there):
    val hot = (1 to 1000).map(_ => 7L) ++ (1 to 200).map(i => (i % 50).toLong + 100L)
    val hotDf = spark.createDataset(hot).toDF("k").repartition(5)
    val hotGot = hotDf.agg(sketch($"k").as("hh"))
      .select(explode($"hh").as(Seq("k", "cnt")))
      .as[(Long, Long)].collect().toMap
    // key 7: freq 1000 > n/cap = 1200/16 = 75 — must survive
    assert(hotGot.contains(7L))
    assert(hotGot(7L) >= 1000L - 1200L / cap)
  }
}
