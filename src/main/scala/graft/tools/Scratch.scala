package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway q100 kernel experiment (delete freely): salted SMJ with a
  * codegen dot condition vs a grouped primitive-array GEMM kernel.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    import graft.operators.{Dedup, ExactAnn, KMeans}
    import s.implicits._

    val df = graft.Tables(s, sfDir, "embeddings")
    val tau = 0.4
    val k = 8
    val saltFactor = 8

    def kernelPairs(): org.apache.spark.sql.DataFrame = {
      val ivf = ExactAnn.build(df, "embedding", "vec_id", k, 4)
      val assigned = KMeans.assign(
          df.withColumn("_nv", ExactAnn.normalized(col("embedding"))),
          "_nv", ivf.model)
        .select(col("vec_id").cast("long").as("_id"), col("_nv"),
          col("cluster").as("_c"))
      val cents = ivf.model.centroids.map(_.toArray)
      def dist(a: Array[Double], b: Array[Double]): Double = {
        var sum = 0.0; var i = 0
        while (i < a.length) { val d = a(i) - b(i); sum += d * d; i += 1 }
        math.sqrt(sum)
      }
      val cand: Seq[(Int, Int)] = cents.indices.flatMap { i =>
        cents.indices.filter(_ >= i).filter { j =>
          val gap = math.max(0.0,
            dist(cents(i), cents(j)) - ivf.radii.getOrElse(i, 0.0) -
              ivf.radii.getOrElse(j, 0.0))
          1.0 - gap * gap / 2.0 >= tau - 1e-6
        }.map(j => (i, j))
      }
      val thr = tau - 1e-6
      val candByCluster: Map[Int, Seq[Int]] =
        cand.groupBy(_._1).map { case (i, ps) => i -> ps.map(_._2) }
      val pairIdx: Map[(Int, Int), Int] = cand.zipWithIndex.toMap
      val bcCand = s.sparkContext.broadcast((candByCluster, pairIdx))
      val rows = assigned.as[(Long, Seq[Double], Int)].flatMap {
        case (id, v, c) =>
          val (byC, pIdx) = bcCand.value
          val vec = v.toArray
          val salt = (id.hashCode % saltFactor + saltFactor) % saltFactor
          // B side: this row's own cluster as the j of any pair (i, c)
          val bSide = pIdx.iterator.collect {
            case ((i, j), p) if j == c => (p, salt, false, id, vec)
          }.toSeq
          // A side: pairs (c, j) — replicate to every salt
          val aSide = byC.getOrElse(c, Seq.empty).flatMap { j =>
            val p = pIdx((c, j))
            (0 until saltFactor).map(sl => (p, sl, true, id, vec))
          }
          bSide ++ aSide
      }
      val pairsInv = cand.zipWithIndex.map(_.swap).toMap
      val bcInv = s.sparkContext.broadcast(pairsInv)
      val out = rows.groupByKey(r => (r._1, r._2)).flatMapGroups {
        (pk: (Int, Int),
         it: Iterator[(Int, Int, Boolean, Long, Array[Double])]) =>
          val (ci, cj) = bcInv.value(pk._1)
          val within = ci == cj
          val aIds = scala.collection.mutable.ArrayBuffer[Long]()
          val aVs = scala.collection.mutable.ArrayBuffer[Array[Double]]()
          val bIds = scala.collection.mutable.ArrayBuffer[Long]()
          val bVs = scala.collection.mutable.ArrayBuffer[Array[Double]]()
          it.foreach { case (_, _, isA, id, vec) =>
            if (isA) { aIds += id; aVs += vec } else { bIds += id; bVs += vec }
          }
          val res = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
          var ai = 0
          while (ai < aIds.length) {
            val av = aVs(ai); val aid = aIds(ai)
            var bi = 0
            while (bi < bIds.length) {
              val bid = bIds(bi)
              if (!within || aid < bid) {
                val bv = bVs(bi)
                var d = 0.0
                var x = 0
                val n = math.min(av.length, bv.length)
                while (x < n) { d += av(x) * bv(x); x += 1 }
                if (d >= thr)
                  res += ((math.min(aid, bid), math.max(aid, bid)))
              }
              bi += 1
            }
            ai += 1
          }
          res.iterator
      }.toDF("vec_a", "vec_b")
      val raw = df.select(col("vec_id").cast("long").as("_rid"),
        col("embedding").cast("array<double>").as("_rv"))
      out
        .join(raw, col("vec_a") === col("_rid"))
        .withColumnRenamed("_rv", "_va").drop("_rid")
        .join(raw, col("vec_b") === col("_rid"))
        .withColumnRenamed("_rv", "_vb").drop("_rid")
        .withColumn("cos_sim", round(graft.plans.NativeVector.cosine(s,
          col("_va"), col("_vb")), 6))
        .filter(col("cos_sim") >= tau)
        .select(col("vec_a"), col("vec_b"), col("cos_sim"))
    }

    // warm both
    val cur0 = Dedup.semanticNearDupPairs(df, "embedding", "vec_id",
      tau, k, 4).collect()
    val ker0 = kernelPairs().collect()
    (1 to 3).foreach { i =>
      time(s"current #$i")(Dedup.semanticNearDupPairs(df, "embedding",
        "vec_id", tau, k, 4).write.format("noop").mode("overwrite").save())
      time(s"kernel  #$i")(kernelPairs()
        .write.format("noop").mode("overwrite").save())
    }
    def key(r: org.apache.spark.sql.Row) =
      (r.get(0).asInstanceOf[Number].longValue,
        r.get(1).asInstanceOf[Number].longValue, r.getDouble(2))
    val a = cur0.map(key).toSet
    val b = ker0.map(key).toSet
    println(s"[scratch] sets equal: ${a == b} (cur=${a.size} ker=${b.size})")
    spark.stop()
  }
}
