package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("k-means separates well-separated blobs deterministically") {
    // two tight 3-d blobs around (0,0,0) and (10,10,10)
    val pts = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 0.0 else 10.0
      (i.toLong, Seq(base + i * 0.01, base - i * 0.01, base + 0.005 * i))
    }
    val df = pts.toDF("id", "vec")
    val model = KMeans.fit(df, "vec", "id", k = 2, maxIter = 10)
    assert(model.k == 2)
    val assigned = KMeans.assign(df, "vec", model)
      .select(col("id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val evens = pts.filter(_._1 % 2 == 0).map(t => assigned(t._1)).toSet
    val odds = pts.filter(_._1 % 2 == 1).map(t => assigned(t._1)).toSet
    assert(evens.size == 1 && odds.size == 1 && evens != odds) // clean split
    // deterministic: refit gives the same centroids
    val again = KMeans.fit(df, "vec", "id", k = 2, maxIter = 10)
    assert(again.centroids == model.centroids)
    // centroids are the blob means
    val low = model.centroids.minBy(_.head)
    assert(low.forall(v => v > -1 && v < 1))
  }

  test("empty clusters keep their previous centroid") {
    // k=3 over 2 distinct points: one centroid can never win any point
    val df = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 1.0))).toDF("id", "vec")
    val model = KMeans.fit(df, "vec", "id", k = 2, maxIter = 5)
    assert(model.centroids.toSet == Set(Seq(0.0, 0.0), Seq(1.0, 1.0)))
  }

  test("ExactAnn equals brute force and prunes separable clusters") {
    // 3 tight blobs on the unit sphere directions; query near blob 0
    val dirs = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), Seq(0.0, 0.0, 1.0))
    val pts = (0 until 30).map { i =>
      val d = dirs(i % 3)
      (i.toLong, d.zipWithIndex.map { case (v, j) => v * 5 + 0.01 * ((i + j) % 5) })
    }
    val df = pts.toDF("id", "vec")
    val ivf = ExactAnn.build(df, "vec", "id", k = 3, maxIter = 10)
    val query = Seq(1.0, 0.02, 0.01)
    val got = ExactAnn.search(spark, df, "vec", "id", query, 5, ivf)
      .select("id").as[Long].collect().toSeq
    // brute force via the same cosine kernel
    val brute = df.select(col("id"),
      graft.plans.NativeVector.cosine(spark, col("vec").cast("array<double>"),
        array(query.map(lit): _*)).as("c"))
      .orderBy(col("c").desc, col("id")).limit(5)
      .select("id").as[Long].collect().toSeq
    assert(got == brute)
    // the blob layout is separable: radii are small vs centroid spacing,
    // so the bound must exclude at least one cluster for this query
    val qn = {
      val n = math.sqrt(query.map(x => x * x).sum); query.map(_ / n)
    }
    val dCent = ivf.model.centroids.map(c =>
      math.sqrt(c.zip(qn).map { case (x, y) => (x - y) * (x - y) }.sum))
    val excludable = ivf.model.centroids.indices.count { c =>
      dCent(c) - ivf.radii.getOrElse(c, 0.0) > 0.5
    }
    assert(excludable >= 1)
  }

  test("cluster-partitioned layout prunes probe scans to probed directories") {
    // the 100 TB IVF path: write partitioned by cluster id, probe one
    // cluster → the scan must read ONLY that partition's files
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/ds"
    val pts = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0.0 else 10.0
      (i.toLong, Seq(base + i * 0.01, base - i * 0.01))
    }
    val df = pts.toDF("id", "vec")
    val model = KMeans.fit(df, "vec", "id", k = 2, maxIter = 10)
    KMeans.assign(df, "vec", model).write
      .partitionBy("cluster").parquet(dir)
    val back = spark.read.parquet(dir)
    val probed = back.filter(col("cluster") === 0)
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(probed.nonEmpty)
    assert(probed.forall(_.contains("cluster=0"))) // partition-pruned scan
    val all = back.select(input_file_name()).distinct().count()
    assert(probed.length < all) // strictly fewer files than a full scan
  }

  test("assignment is map-side: no exchange in the plan") {
    val df = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(5.0, 5.0))).toDF("id", "vec")
    val model = KMeans.Model(Seq(Seq(0.0, 0.0), Seq(5.0, 5.0)))
    val plan = KMeans.assign(df, "vec", model).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
