package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-robustness probe: replicate the sf0.1 corpus m× with key offsets
  * (so joins stay linear — matching fact keys shift together), run headline
  * registry queries at 1× and m×, and report the wall-time ratio per query.
  * A query whose ratio grows much faster than m has a hidden superlinear
  * path — exactly the class of bug the 100 TB bar cares about. Dimension
  * tables stay as-is (they'd be broadcast at any scale).
  */
object ScaleCheck {

  private val Queries = Seq(
    "q01_filter_project", "q02_agg_groupby", "q03_global_agg", "q05_join_multi",
    "q12_window_running", "q13_window_rank", "q15_topn", "q16_sample_det",
    "q17_sample_stratified", "q28_dedup_exact", "q33_lsh_pairs", "q35_simhash",
    "q36_lang_id", "q38_fingerprint", "q40_sessionize", "q51_window_range",
    "q56_tpch_q3", "q57_tpch_q18", "q66_mean_ap", "q75_percentile_group",
    "q97_gopher_rules", "q99_rolling_window",
    "q103_mixture_sample", "q104_sequence_pack", "q105_charlm_score",
    "q106_dupspan_stats", "q109_sample_strat_fraction", "q118_pagerank_neardup",
    "q126_hard_negatives", "q131_bpe_merges",
    "q132_nb_classifier", "q133_ndcg", "q134_bpe_tokenize",
    "q142_url_dedup", "q144_paragraph_dedup", "q146_psl_domains",
    "q148_psl_wildcards", "q149_recompute_columns", "q150_ann_ivfpq",
    "q151_catalog_tree", "q152_update_status", "q153_batch_upsert",
    "q154_minhash_index", "q155_pca_embed", "q156_sample_priority",
    "q157_heavy_hitters", "q158_change_feed", "q159_zorder_compact",
    "q160_audio_codecs", "q161_bloom_lookup", "q162_optimize_policy",
    "q163_string_cluster", "q164_flac_roundtrip", "q165_office_chunks",
    "q166_compressed_docs",
    // r12 media gates: all doc_id-bounded map-only container work —
    // flat-under-replication expected, like the r11 media gates
    "q180_mkv_container", "q181_ogg_heif_meta", "q182_corpus_rehearsal",
    "q183_vorbis_tags",
    // streaming gates: q184 is doc_id-bounded (flat expected); q185 reads
    // the FULL corpus through the stream-static gram join, so its ratio
    // measures the streaming path's data-proportional scaling
    "q184_stream_neardup", "q185_stream_decontam",
    // q188/q189: map-only page rasterization / CCITT fax decode over
    // doc_id-bounded fixtures — the pushed predicate keeps replicas
    // unscanned (flat expected)
    "q188_pdf_render", "q189_ccitt_fax",
    // q190: full-corpus HLL sketch — linear map-side hash work, but the
    // partial aggregate caps shuffle traffic at groups×256 rows per
    // partition, so the ratio should track m sub-linearly (the exact
    // countDistinct verification side is the data-proportional part);
    // measured ~1 at both 10x and 100x (overhead-dominated). q191 is
    // its streaming twin over a doc_id-bounded slice (flat expected)
    "q190_hll_sketch", "q191_stream_hll",
    // q192: map-only pattern/shading rendering over bounded fixtures
    "q192_pdf_patterns",
    // q193: CMS counters over a doc_id-bounded token stream — the
    // explode grows rows 4x but the partial aggregate caps shuffle at
    // d*w rows per partition (flat-ish expected at this bound)
    "q193_countmin",
    // r14 gates: q201/q202/q204 are doc_id-bounded (< 40) map-only
    // codec fixtures (JBIG2 refinement/halftone, tiled JPX) — the
    // pushed predicate keeps replicas unscanned, flat expected like
    // q188/q189/q192; q203 is the RocksDB streaming gate over a
    // doc_id-bounded slice (flat expected like q184)
    "q201_jbig2_refine", "q202_jbig2_halftone", "q203_stream_rocksdb",
    "q204_jpx_tiled")
  // q159 is a bounded DML-lifecycle gate (l_orderkey < 1600 slice →
  // constant under key-offset replication; measures z-order write + footer
  // metadata reads, expected ~1); q160 is map-only codec work over a
  // bounded doc_id slice (< 32), expected ~1.
  // r10 final additions: q155 PCA is one treeAggregate over the m×-grown
  // embeddings (O(d²) driver state, ratio should track m sub-linearly);
  // q156 priority sampling is per-partition top-k (TakeOrderedAndProject —
  // flat-ish, merge cost k·P); q157 Space-Saving is a partial-aggregate
  // sketch over m× lineitem rows (tracks m, zero shuffle of raw rows);
  // q158 change feed is a DML-lifecycle gate bounded at o_orderkey < 800
  // (constant input under key-offset replication — measures the window
  // pushdown + fixed job overhead, expected ~1 like q151-q154).
  // r10 late additions: q151-q154 are DML-lifecycle gates over bounded
  // doc_id slices (< 40/50) — replication offsets doc_id per copy, so the
  // gates' inputs stay CONSTANT and the ratio measures pushdown + fixed
  // job-count overhead (expected ~1). The index/scan shapes behind them
  // scale via the operators' own rows above (q33 for the minhash family).
  // r10 additions: q148 is the wildcard/exception PSL path (pushdown-
  // bounded, should stay flat like q146); q149 is a DML-lifecycle gate
  // (temp warehouse, doc_id-bounded); q150's PQ train is a bounded driver
  // sample, the map-only encode + ADC grow with m (10x measured 1.0 —
  // fixed job-count overhead dominates at this absolute size).
  // r8: q142's canonical-URL groupBy-window and q144's paragraph
  // first-occurrence window are both one-shuffle-on-a-high-cardinality-key
  // shapes — the ratios should track m. (Replication with doc_id offsets
  // regenerates DISTINCT urls per copy and repeats paragraph text across
  // copies, so q144 also exercises the heavier all-duplicates regime.)
  // r8 additions (VERDICT r7 #8): q109's key-range-bucketed exact-rank
  // sampling — strata (returnflag) stay fixed under replication while rows
  // grow m×, so per-stratum offset tables stay tiny and the ratio should
  // track m. q118's pair join is id-bounded (doc_id < 200, all in copy 0)
  // so the graph and the 5 checkpointed iterations stay constant — the
  // ratio measures scan growth plus fixed loop overhead, NOT an edge
  // blow-up (replication would otherwise square the near-dup pair count,
  // the same artifact that excludes q100/q107). q133 ranks a fixed query
  // set over the m×-grown corpus: TakeOrderedAndProject candidates then a
  // constant-size NDCG aggregate.
  // q131/q134 under replication: the corpus-token shuffle grows m× but the
  // iterated table stays VOCABULARY-sized (replicas add counts, not
  // words), so rounds are flat; q132's model grid is fixed k×L.
  // q126 under replication: the probe set stays fixed (vec_id < 8, all in
  // copy 0) while the corpus grows m× — scoring is map-side so the ratio
  // should track m; replicas tie at equal cosine but k stays constant.
  // q107 is absent like q100: replication makes every document an exact
  // dup of its copies, so covered positions approach 100% and the
  // reassembly output collapses — the ratio would measure the artifact.
  // q100_semantic_neardup is intentionally absent: replication duplicates
  // every embedding, so the TRUE near-dup pair count grows quadratically
  // with m (every copy matches every copy at cos=1) — the ratio would
  // measure the data artifact, not the plan. Its scale shape (single
  // cluster-key shuffle, broadcast candidates) is plan-asserted in
  // DedupSpec instead.

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    // optional trailing query names: probe a subset (e.g. the 100x depth
    // run over the cheapest map-only/one-shuffle shapes)
    val toRun = if (args.length > 2) args.drop(2).toSeq else Queries
    // keyed by BASE as well as mult: a replica built from sf0.01 must
    // never silently serve an sf0.1 probe (r13 found exactly that —
    // r12's q109 "100x" figure was measured against a 6M-row leftover)
    val bigDir = s"/tmp/graft_scale_${new java.io.File(base).getName}_${mult}x"
    // honors SPARK_GRAFT_CPUS like graft.Bench so the same replicated
    // corpus can be probed at different core counts (r16 core-scaling
    // evidence: VERDICT item 6 — sf0.1 fixtures sit on the scheduling
    // floor, so c8/c32 ratios are only meaningful at 10x+)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def replicate(name: String, keyCols: Map[String, Long]): Unit = {
      val src = spark.read.parquet(s"$base/$name.parquet")
      val copies = (0 until mult).map { i =>
        keyCols.foldLeft(src) { case (df, (c, span)) =>
          df.withColumn(c, col(c) + lit(i * span))
        }
      }
      copies.reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$bigDir/$name.parquet")
    }

    if (!new java.io.File(s"$bigDir/lineitem.parquet").exists()) {
      println(s"[scale] building ${mult}x corpus at $bigDir")
      // offset spans chosen > max key in the sf0.1 corpus so copies disjoint
      replicate("lineitem", Map("l_orderkey" -> 10000000L))
      replicate("orders", Map("o_orderkey" -> 10000000L))
      replicate("events", Map("event_id" -> 100000000L, "user_id" -> 1000000L))
      replicate("documents", Map("doc_id" -> 10000000L))
      replicate("embeddings", Map("vec_id" -> 10000000L))
      for (dim <- Seq("region", "nation", "customer", "supplier", "part"))
        spark.read.parquet(s"$base/$dim.parquet")
          .write.mode("overwrite").parquet(s"$bigDir/$dim.parquet")
    }

    // noop sink, as in Bench: rows are fully produced on executors but not
    // serialized to the driver — collect() would make any query with
    // data-proportional output (q12 emits every row) look superlinear from
    // single-threaded driver deserialization alone, hiding the plan's
    // actual scaling
    def time(dir: String, name: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    println(f"[scale] ${"query"}%-24s ${"1x"}%8s ${mult + "x"}%8s  ratio")
    var worst = ("", 0.0)
    toRun.foreach { name =>
      val t1 = time(base, name)
      val tm = time(bigDir, name)
      val ratio = tm / math.max(t1, 1e-9)
      if (ratio > worst._2) worst = (name, ratio)
      println(f"[scale] $name%-24s $t1%8.2f $tm%8.2f  ${ratio}%5.1f")
    }
    println(f"[scale] worst ratio: ${worst._1} ${worst._2}%.1f (m=$mult)")
    spark.stop()
  }
}
