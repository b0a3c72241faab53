package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graft.{TopKBuf, TopKPairs}
import graft.pipeline.Similarity

/** The map-side-truncating top-k aggregate that replaced the
  * row_number() window in ANN cell assignment / brute-force top-k:
  * ordering semantics must stay bit-identical to the window (and the
  * DuckDB ROW_NUMBER oracle), including ties and NaN-sorts-greatest.
  */
class TopKSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("TopKBuf keeps best-first order with ties and NaN") {
    val b = new TopKBuf(3)
    b.insert(0.5, 10); b.insert(0.7, 4); b.insert(0.5, 2)
    b.insert(Double.NaN, 9); b.insert(0.1, 1)
    // NaN greatest, then 0.7, then ties on 0.5 broken by smaller id
    assert(b.n == 3)
    assert(b.id.take(3).toSeq == Seq(9L, 4L, 2L))
    assert(b.ord(0).isNaN)
  }

  test("TopKBuf truncates below an incoming better element") {
    val b = new TopKBuf(2)
    b.insert(1.0, 1); b.insert(2.0, 2); b.insert(3.0, 3)
    assert(b.id.take(b.n).toSeq == Seq(3L, 2L))
    b.insert(0.5, 0) // worse than all — dropped
    assert(b.id.take(b.n).toSeq == Seq(3L, 2L))
  }

  test("null ord ranks last-but-present, ties among nulls by id ASC — matching the window") {
    val s = spark
    import s.implicits._
    // sim null arises from Divide-by-zero (zero-norm cosine) — the
    // window kept those rows at the tail; so must the aggregate
    val df = Seq(
      (1L, 10L, Some(0.5)), (1L, 11L, None), (1L, 12L, Some(0.9)),
      (1L, 13L, None), (1L, 14L, Some(0.1))
    ).toDF("g", "id", "ord")
    val viaAgg = df.groupBy("g")
      .agg(TopKPairs(col("ord"), col("id"), 4).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), col("t.id").as("id"), (col("pos") + 1).as("rnk"))
    val w = Window.partitionBy("g").orderBy(col("ord").desc, col("id").asc)
    val viaWindow = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 4).select(col("g"), col("id"), col("rnk").cast("int"))
    assert(viaAgg.collect().toSet == viaWindow.collect().toSet)
    // explicit shape: 0.9, 0.5, 0.1, then first null by id
    val order = viaAgg.orderBy("rnk").collect().map(_.getLong(1)).toSeq
    assert(order == Seq(12L, 10L, 14L, 11L))
  }

  test("aggregate matches the row_number window on seeded data with ties and NaN groups") {
    val s = spark
    import s.implicits._
    // deterministic scores with repeats (ties) and a NaN per group
    val rows = (0 until 40).flatMap { g =>
      (0 until 25).map { i =>
        val ord =
          if (i == 13) Double.NaN
          else ((g * 31 + i * 17) % 7).toDouble / 7.0
        (g.toLong, i.toLong, ord)
      }
    }
    val df = rows.toDF("g", "id", "ord")
    val viaAgg = df.groupBy("g")
      .agg(TopKPairs(col("ord"), col("id"), 4).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), col("t.id").as("id"), (col("pos") + 1).as("rnk"))
    val w = Window.partitionBy("g").orderBy(col("ord").desc, col("id").asc)
    val viaWindow = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 4).select(col("g"), col("id"), col("rnk").cast("int"))
    assert(viaAgg.collect().toSet == viaWindow.collect().toSet)
  }

  test("aggregate plans as ObjectHashAggregate (partial map-side truncation), no window exchange of scored rows") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2L, 0.5)).toDF("g", "id", "ord")
    val plan = df.groupBy("g").agg(TopKPairs(col("ord"), col("id"), 2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(!plan.contains("Window"))
  }

  test("bruteForceTopK returns ranked neighbours identical to its pre-aggregate window form") {
    val s = spark
    import s.implicits._
    val vecs = (0L until 30L).map { i =>
      (i, Array.tabulate(8)(d => (((i * 13 + d * 7) % 11) - 5).toFloat / 5f))
    }.toDF("vec_id", "embedding")
    val r = Similarity.bruteForceTopK(vecs, nQueries = 3L, k = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.length == 12) // 3 queries × 4 neighbours
    // ranks are 1..4 per query, neighbours never the query itself
    r.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
      assert(rs.forall(_._2 != q))
    }
    // spot-check rank-1 for query 0 against a driver-side exact scan
    val all = vecs.collect().map(x => (x.getLong(0), x.getSeq[Float](1).toArray))
    def qz(v: Array[Float]) = v.map(x => math.floor(x.toDouble * 1000).toLong)
    val q0 = qz(all.find(_._1 == 0L).get._2)
    def cos(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => x * y }.sum /
        math.sqrt(a.map(x => x * x).sum.toDouble) / math.sqrt(b.map(x => x * x).sum.toDouble)
    val best = all.filter(_._1 != 0L)
      .map { case (i, v) => (i, cos(q0, qz(v))) }
      .sortBy { case (i, c) => (-c, i) }.head._1
    assert(r.find(x => x._1 == 0L && x._3 == 1L).get._2 == best)
  }
}
