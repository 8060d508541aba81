package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import graft.SparkTestBase
import graft.engine.{CategoryPath, Flatten}
import graft.sources.XmlSource

/** Plan-shape regression guards: the scale-critical structural properties
  * (SCALE.md) asserted against the executed physical plans, so a future
  * "correct but shuffling" rewrite fails loudly. */
class PlanShapeSpec extends SparkTestBase {

  private def executedPlan(df: DataFrame): String = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  test("flatten is one narrow projection + one broadcast join: no shuffle " +
       "Exchange on the fact side") {
    val path = fixture("yml_offer.xml")
    val flat = Flatten.flattenOffers(
      XmlSource.read(spark, path, XmlSource.Yml), XmlSource.Yml,
      Some(XmlSource.categoryPaths(XmlSource.readCategories(spark, path))))
    val plan = executedPlan(flat)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
           s"category join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no sort-merge on the fact side:\n$plan")
    // the only exchanges allowed are broadcast ones (category dim + path dim)
    val shuffleExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length +
      "Exchange rangepartitioning".r.findAllIn(plan).length
    assert(shuffleExchanges === 0,
           s"fact side must not shuffle, found $shuffleExchanges:\n$plan")
  }

  test("category attach is a broadcast hash join, never sort-merge") {
    import spark.implicits._
    val paths = Seq(("1", "Root")).toDF("id", "category_path")
    val facts = Seq(("f1", "1")).toDF("fact", "cat")
    val plan = executedPlan(CategoryPath.attach(facts, "cat", paths))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q01 multi-value agg: partial aggregation before its single hash exchange") {
    val df = queries.Catalog.byName("q01_multivalue_dedup")
      .run(spark, "/root/testdata/sf0.001")
    val plan = executedPlan(df)
    // partial+final pattern: two HashAggregate/ObjectHashAggregate levels
    val aggs = "HashAggregate".r.findAllIn(plan).length
    assert(aggs >= 2, s"expected partial+final aggregation:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("bucketed tables co-locate their join: no shuffle exchange on either side") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // DROP TABLE forgets catalog entries but a crashed prior run can leave
    // the physical warehouse dirs behind — saveAsTable then refuses the
    // location. Scrub them so the test is self-healing.
    for (t <- Seq("li_bucketed", "ord_bucketed")) {
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        val walk = java.nio.file.Files.walk(loc.toPath)
        val all =
          try walk.iterator().asScala.toSeq finally walk.close()
        all.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    queries.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    queries.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed").hint("merge"),
            col("l_orderkey") === col("o_orderkey"))
    val plan = executedPlan(joined)
    assert(!plan.contains("Exchange hashpartitioning"),
           s"bucketed join must not shuffle:\n$plan")
  }

  test("q154 catalog query: bucketed layout keeps the doc-embedding join " +
       "hash-exchange-free (only the final orderBy repartitions)") {
    val df = queries.Catalog.byName("q154_bucketed_join")
      .run(spark, "/root/testdata/sf0.001")
    val plan = executedPlan(df)
    assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
           s"bucketed sides must satisfy the join's distribution:\n$plan")
    assert(plan.contains("Bucketed: true"),
           s"both scans must actually read as bucketed:\n$plan")
  }

  test("partitioned layout prunes partitions: a date filter reaches the " +
       "scan as a PartitionFilter and unmatched partitions are not read") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_ppart")
    try {
      queries.Tables(spark, "/root/testdata/sf0.001", "events")
        .withColumn("day", to_date(col("ts")))
        .write.partitionBy("day").mode("overwrite")
        .parquet(dir.resolve("events").toString)
      val all = spark.read.parquet(dir.resolve("events").toString)
      val firstDay = all.select(min(col("day"))).head().getDate(0)
      val q = all.filter(col("day") === lit(firstDay))
        .groupBy(col("event_type")).count()
      val plan = executedPlan(q)
      // the EQUALITY must appear inside PartitionFilters (an isnotnull-only
      // residue would list `day` but prune nothing)
      assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*day[^\\]]*=[^\\]]*\\].*"),
             s"day equality must prune partitions at the scan:\n$plan")
      // and semantically: the pruned read returns exactly that day's rows
      val expected = all.filter(col("day") === lit(firstDay)).count()
      assert(q.agg(sum(col("count"))).head().getLong(0) === expected)
    } finally {
      val walk = java.nio.file.Files.walk(dir)
      val all = try walk.iterator().asScala.toSeq finally walk.close()
      all.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("corpusFilter is one scan + one exchange (flags fused into the " +
       "projection, only the dedup window shuffles)") {
    val df = analytics.TextAnalysis.corpusFilter(
      queries.Tables(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text")
    // under AQE the plan string repeats as "Final Plan" + "Initial Plan" —
    // count only the final section
    val plan = executedPlan(df).split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly one keyed exchange:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 1, s"expected exactly one scan:\n$plan")
  }

  test("catalog sweep: no CartesianProduct anywhere; BroadcastNestedLoopJoin " +
       "only where a broadcast x tiny-side probe is the design") {
    val dir = "/root/testdata/sf0.001"
    // BNLJ is legitimate ONLY when one side is a deliberately broadcast
    // dictionary-sized frame probed with a non-equi condition:
    //   q24 brute-force knn: query x broadcast corpus (the baseline op)
    //   q25 ivf:             vectors x broadcast centroid set
    //   q38 ivf near-dup:    vectors x broadcast centroid set
    //   q77 surprisal:       doc-word counts x broadcast ONE-ROW corpus total
    //   q79 pq adc:          corpus codes x broadcast tiny query set
    //   q88 surprisal gate:  scored corpus x broadcast ONE-ROW percentile
    //   q97 external gate:   same ONE-ROW percentile bracket as q88
    //   q101 knn classify:   rides the q24 query x broadcast corpus probe
    //   q106 rocchio:        corpus x broadcast per-label centroid set
    //   q108 dsir:           64-bucket model x broadcast ONE-ROW totals
    //   q110 naive bayes:    ids x broadcast per-class priors, model grid
    //   q116 quantiles:      corpus x broadcast ONE-ROW threshold array
    //   q120 count-min:      distinct keys x broadcast literal probe grid
    //   q121 dsir select:    scored corpus x broadcast ONE-ROW percentile
    //   q123 bloom:          distinct keys x broadcast literal probe grid
    //   q131 stupid-backoff: bigram counts x broadcast ONE-ROW corpus total
    //   q147 kneser-ney:     bigram counts x broadcast ONE-ROW distinct-bigram total
    //   q134 hard negatives: query x broadcast corpus, non-equi label guard
    //   q135 bm25:           postings x broadcast ONE-ROW corpus stats
    //   q136 hybrid rrf:     q135's stats bracket + q24's broadcast corpus
    val bnljAllowed = Set("q24_knn_brute", "q25_knn_ivf", "q38_cosine_neardup",
      "q77_unigram_surprisal", "q79_pq_adc_topk", "q88_surprisal_gate",
      "q97_external_surprisal", "q101_knn_classify", "q106_centroid_classify",
      "q108_dsir_weights", "q110_nb_classify", "q116_quantile_buckets",
      "q120_cm_sketch", "q121_dsir_select", "q123_bloom_filter",
      "q131_stupid_backoff", "q134_hard_negatives", "q147_kneser_ney",
      "q135_bm25_topk", "q136_hybrid_rrf", "q139_retrieval_metrics",
      "q143_vocab_drift",
      // q169: keys x keys pair probe over the broadcast dictionary-sized
      // sketch table (non-equi key_a < key_b) — the design, not a leak
      "q169_kmv_overlap",
      // q182: user lifetimes x broadcast ONE-ROW feed-cutoff date (the
      // q77/q88 one-row-total bracket)
      "q182_kaplan_meier",
      // q194: shortlist rides the q24 query x broadcast corpus probe
      // (swap in ivfTopK upstream at scale); the MMR steps themselves
      // are equi-joins over candidates-sized tables
      "q194_mmr_rerank",
      // q198: label marginals x broadcast ONE-ROW totals (po/pe
      // brackets) — machine-checked below. (q199's per-round 1-row
      // normalizer broadcasts never reach the FINAL plan: each round
      // localCheckpoints, so the sweep sees only the last equi-join.)
      "q198_kappa",
      // q200: source rollup x broadcast ONE-ROW corpus token total
      // (the q77 bracket) — machine-checked below
      "q200_source_scorecard",
      // q218: orders x broadcast ONE-ROW max-date, then customers x
      // broadcast ONE-ROW threshold arrays (the q116 bracket) —
      // machine-checked below
      "q218_rfm_segments",
      // q229: slice stats x broadcast ONE-ROW feed max — machine-checked
      // below
      "q229_freshness_audit",
      // q227: corpus x broadcast query sample, non-equi self-exclusion
      // (the q24 brute-force baseline probe — swap IVF upstream at
      // serving scale)
      "q227_truncation_recall",
      // q233: the r x c contingency spine is margin x margin — one
      // build side the ONE-ROW grand total, the other the per-source
      // margin (keyed, dictionary-bounded) — machine-checked below
      "q233_chi_square",
      // q241: facts x broadcast ONE-ROW max-date (the q218 recency
      // bracket) — machine-checked below
      "q241_decayed_topk",
      // q247: WOE cells x broadcast ONE-ROW class totals (the q77
      // bracket) — machine-checked below
      "q247_woe_buckets",
      // q248: top-k coverage rows x broadcast ONE-ROW token total —
      // machine-checked below
      "q248_vocab_coverage",
      // q250: one-row observed diff x broadcast ONE-ROW percentile CI —
      // machine-checked below
      "q250_bootstrap_diff_ci",
      // q260/q261/q262/q264/q265: category/bin/moment tables x broadcast
      // ONE-ROW totals (the q77 bracket) — machine-checked below
      "q260_js_drift", "q261_target_encoding", "q262_equal_freq_bins",
      "q264_assortativity", "q265_ams_f2",
      // q263: classes x broadcast (sensitive-dictionary x ONE-ROW total)
      // completion — both build-side structures machine-checked below
      // q224: scored bigram grid x broadcast ONE-ROW bigram total (the
      // q77/q116 bracket) — visible since the r15 grid fold removed the
      // output materialize that used to hide the final plan;
      // machine-checked below
      "q224_pmi_collocations",
      // (the q233 margin-x-total shape)
      "q263_t_closeness",
      // q266: user lifetimes x broadcast ONE-ROW feed-cutoff date (the
      // q182 bracket) — machine-checked below
      "q266_nelson_aalen",
      // q267: corpus x broadcast query sample, non-equi self-exclusion
      // (the q24/q227 brute-baseline probe — swap IVF upstream at
      // serving scale), plus a histogram x broadcast ONE-ROW slot total
      "q267_hubness",
      // q268/q270: count/margin tables x broadcast ONE-ROW totals and
      // percentile brackets (the q77/q116 shape) — machine-checked below
      "q268_join_skew", "q270_mutual_information",
      // q269: rides q233's margin x margin contingency spine (one-row
      // total + dictionary-bounded margin) — machine-checked below
      "q269_cramers_v",
      // q272: the PAV pair grid is bucket-table x bucket-table
      // (non-equi sj <= sk) — both sides the SAME keyed score-bucket
      // aggregate, dictionary-bounded by the score scale; q169 shape,
      // machine-checked below
      "q272_isotonic_calibration",
      // q273: pooled-CDF side rides a broadcast ONE-ROW pooled total
      // (the q77 bracket) — machine-checked below
      "q273_quantile_normalize",
      // q274: <= (k+1)-row TakeOrdered head x broadcast ONE-ROW
      // max-rank / threshold brackets — machine-checked below
      "q274_hill_tail_index",
      // q275: lifetimes x broadcast ONE-ROW feed-cutoff date (the q182
      // bracket) + the distinct-lifetime grid x a broadcast TWO-ROW
      // Range (the arm completion) — machine-checked below
      "q275_log_rank_test",
      // q280: per-group terms x broadcast ONE-ROW (n, ties) totals
      // (the q77 bracket) — machine-checked below
      "q280_kruskal_wallis",
      // q283: the pair grid is key-dictionary x key-dictionary
      // (non-equi key_a < key_b over the per-key totals aggregate —
      // the q272 shape); build sides are KEYED aggregates bounded by
      // the source dictionary — machine-checked below
      "q283_js_matrix")
    val offenders = queries.Catalog.all.flatMap { q =>
      // plan-compile only (no execution): CartesianProduct can't appear
      // adaptively if it isn't in the initial physical plan
      val plan = q.run(spark, dir).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
        !bnljAllowed(q.name)
      if (cartesian) Some(s"${q.name}: CartesianProduct")
      else if (bnlj) Some(s"${q.name}: unexpected BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("newest BNLJ allowlist entries carry MACHINE-CHECKED reasons: " +
       "q147/q182 build sides are grouping-free one-row aggregates, " +
       "q169's build side is the keyed sketch over a <= 64-key dictionary") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.catalyst.optimizer.BuildLeft
    val dir = "/root/testdata/sf0.001"
    // AQE wraps materialized subtrees in leaf QueryStageExec nodes and
    // de-duplicates identical broadcasts into leaf ReusedExchange refs;
    // traverse through both so build-side structure stays visible
    def deep[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
      val stages = p.collect { case s: QueryStageExec => s.plan }
      val reused = p.collect {
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          r.child
      }
      p.collect(pf) ++ (stages ++ reused).flatMap(deep(_)(pf))
    }
    def buildSides(name: String): Seq[SparkPlan] = {
      val q = queries.Catalog.all.find(_.name == name)
        .getOrElse(fail(s"$name not in catalog"))
      val df = q.run(spark, dir)
      df.collect() // finalize the adaptive plan
      val root = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val joins = deep(root) { case b: BroadcastNestedLoopJoinExec => b }
      assert(joins.nonEmpty, s"$name: expected a BNLJ in the plan")
      joins.map(b => if (b.buildSide == BuildLeft) b.left else b.right)
    }
    // the TOPMOST aggregate below the broadcast determines the
    // broadcast's row count: grouping-free = structurally ONE row,
    // keyed = bounded by that key's dictionary (deep() yields outer
    // nodes before stage subtrees, so .headOption is the topmost)
    def topAggGrouped(p: SparkPlan): Option[Boolean] =
      deep(p) {
        case h: HashAggregateExec => h.groupingExpressions.nonEmpty
        case o: ObjectHashAggregateExec => o.groupingExpressions.nonEmpty
        case s: SortAggregateExec => s.groupingExpressions.nonEmpty
      }.headOption
    // q147/q182/q198/q199: the allowlist comments say "broadcast
    // ONE-ROW total" — prove it: every BNLJ build side must top out in
    // a grouping-free aggregate, which is structurally a single row
    for (name <- Seq("q147_kneser_ney", "q182_kaplan_meier",
        "q198_kappa", "q200_source_scorecard", "q218_rfm_segments",
        "q224_pmi_collocations",
        "q229_freshness_audit", "q241_decayed_topk",
        "q247_woe_buckets", "q248_vocab_coverage",
        "q250_bootstrap_diff_ci", "q260_js_drift",
        "q261_target_encoding", "q262_equal_freq_bins",
        "q264_assortativity", "q265_ams_f2", "q266_nelson_aalen",
        "q268_join_skew", "q270_mutual_information",
        "q273_quantile_normalize", "q280_kruskal_wallis"))
      for (b <- buildSides(name))
        assert(topAggGrouped(b).contains(false),
          s"$name: BNLJ build side must top out in a grouping-free " +
            s"one-row aggregate, got:\n$b")
    // q275: two BNLJ build sides — the grouping-free ONE-ROW feed
    // cutoff (q182's bracket) and the TWO-ROW arm Range completing the
    // lifetime grid; each build side must be one of those structures
    locally {
      import org.apache.spark.sql.execution.RangeExec
      for (b <- buildSides("q275_log_rank_test")) {
        val smallRange = deep(b) {
          case r: RangeExec if r.numElements.toLong <= 2L => r
        }.nonEmpty
        assert(topAggGrouped(b).contains(false) || smallRange,
          s"q275: BNLJ build side must be a one-row aggregate or a " +
            s"<=2-row Range, got:\n$b")
      }
    }
    // q283: the pair-grid BNLJ's build side must be the KEYED per-key
    // totals aggregate (dictionary-bounded), and the source dictionary
    // itself tiny — the q169 proof shape
    locally {
      for (b <- buildSides("q283_js_matrix"))
        assert(topAggGrouped(b).contains(true),
          s"q283: BNLJ build side must be the keyed totals aggregate:\n$b")
      val srcDict = queries.Tables(spark, dir, "documents")
        .select("source").distinct().count()
      assert(srcDict <= 64, s"source dictionary must stay tiny, got $srcDict")
    }
    // q169: the comment says "broadcast dictionary-sized sketch table" —
    // prove the two halves separately: the build side tops out in a
    // BY-KEY aggregate (rows bounded by the key dictionary, independent
    // of event volume), and the key dictionary itself is tiny
    for (b <- buildSides("q169_kmv_overlap"))
      assert(topAggGrouped(b).contains(true),
        s"q169: BNLJ build side must be the keyed sketch aggregate:\n$b")
    val dict = queries.Tables(spark, dir, "events")
      .select("event_type").distinct().count()
    assert(dict <= 64, s"event_type dictionary must stay tiny, got $dict")
    // q233: two BNLJ build sides — the ONE-ROW grand total
    // (grouping-free) and the per-source margin (keyed, bounded by the
    // source dictionary); both structures must be present and the
    // dictionary must stay tiny
    locally {
      val grouped = buildSides("q233_chi_square").flatMap(topAggGrouped)
      assert(grouped.contains(false),
        "q233: expected the grouping-free ONE-ROW total build side")
      assert(grouped.contains(true),
        "q233: expected the keyed margin build side")
      val srcDict = queries.Tables(spark, dir, "documents")
        .select("source").distinct().count()
      assert(srcDict <= 64,
        s"source dictionary must stay tiny, got $srcDict")
    }
    // q263: the q233 shape — the class x value completion crosses the
    // class table against (sensitive-dictionary x ONE-ROW total); both
    // the keyed-dictionary and grouping-free build sides must be
    // present, and the sensitive dictionary must stay tiny
    locally {
      val grouped = buildSides("q263_t_closeness").flatMap(topAggGrouped)
      assert(grouped.contains(false),
        "q263: expected the grouping-free ONE-ROW total build side")
      assert(grouped.contains(true),
        "q263: expected the keyed sensitive-dictionary build side")
      val segDict = queries.Tables(spark, dir, "customer")
        .select("c_mktsegment").distinct().count()
      assert(segDict <= 64,
        s"c_mktsegment dictionary must stay tiny, got $segDict")
    }
    // q269 rides the q233 contingency spine: same two build-side
    // structures (grouping-free one-row total + keyed dictionary margin)
    locally {
      val grouped = buildSides("q269_cramers_v").flatMap(topAggGrouped)
      assert(grouped.contains(false),
        "q269: expected the grouping-free ONE-ROW total build side")
      assert(grouped.contains(true),
        "q269: expected the keyed margin build side")
    }
    // q272: the PAV pair grid's build side is the score-bucket grid —
    // since r14's scan-once pass the keyed bucket aggregate is
    // MATERIALIZED, so the build side reads the checkpointed grid (an
    // RDD scan) instead of containing the aggregate inline; either
    // form is the q169 dictionary shape, but the build side must NEVER
    // read raw volume (no file-source scan). Boundedness of the grid
    // itself is asserted separately below.
    locally {
      for (b <- buildSides("q272_isotonic_calibration")) {
        val keyedAgg = topAggGrouped(b).contains(true)
        // not ANY checkpointed intermediate: the RDD scan must carry
        // the (s, n, np) score-bucket-grid columns, pinning the build
        // side to the materialized bucket aggregate specifically
        val gridScans = deep(b) {
          case r: org.apache.spark.sql.execution.RDDScanExec => r
        }
        val checkpointedGrid = gridScans.nonEmpty && gridScans.forall(
          _.schema.fieldNames.toSet == Set("s", "n", "np"))
        val readsRaw = deep(b) {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.nonEmpty
        assert((keyedAgg || checkpointedGrid) && !readsRaw,
          s"q272: BNLJ build side must be the keyed bucket aggregate " +
            s"or its checkpointed (s, n, np) grid, never a raw scan " +
            s"or an unrelated checkpoint:\n$b")
      }
      val grid = queries.Tables(spark, dir, "lineitem")
        .select((org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("l_discount") * 1000))
          .cast("long")).distinct().count()
      assert(grid <= 64, s"discount score grid must stay tiny, got $grid")
    }
    // q274: build sides are either grouping-free one-row brackets
    // (max-rank, n_types) or the <= (k+1)-row TakeOrdered head — every
    // build side must show one of those two bounded structures
    for (b <- buildSides("q274_hill_tail_index")) {
      val oneRow = topAggGrouped(b).contains(false)
      val bounded = deep(b) {
        case l: org.apache.spark.sql.execution.GlobalLimitExec => l
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
        case c: org.apache.spark.sql.execution.CollectLimitExec => c
      }.nonEmpty
      assert(oneRow || bounded,
        s"q274: BNLJ build side must be a one-row bracket or the " +
          s"bounded top-(k+1) head, got:\n$b")
    }
  }

  test("IVF assignment has no Window over the n x centroids product") {
    import org.apache.spark.sql.functions._
    val df = analytics.Similarity.ivfTopK(
      queries.Tables(spark, "/root/testdata/sf0.001", "embeddings"),
      "vec_id", "embedding", col("vec_id") % 100 === 0, k = 3)
    val plan = executedPlan(df)
    // windows are allowed only on the QUERY side (partition by qid);
    // corpus assignment must be the min_by/max_by aggregate (struct-ordered
    // min_by plans as SortAggregate — still an aggregate, not a window)
    assert(plan.contains("min_by") || plan.contains("max_by") ||
           plan.contains("MinBy") || plan.contains("MaxBy"),
           s"assignment must aggregate, not window:\n$plan")
    // and the aggregation must stay PARTIAL (map-side combine): the
    // exchange carries one partial extremum per vector, never the full
    // n x centroids product
    assert(plan.contains("partial_min_by") || plan.contains("partial_max_by"),
           s"assignment aggregate lost its map-side partial:\n$plan")
    assert(!plan.toLowerCase.contains("window partitionby vid"),
           s"no per-corpus-vector window:\n$plan")
  }

  test("oovRate joins the bounded vocab by broadcast, never sort-merge") {
    val df = analytics.TextAnalysis.oovRate(
      queries.Tables(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", topN = 16)
    val plan = executedPlan(df)
    // the vocab side is bounded by topN -> must broadcast; the only
    // sort-merge allowed is the final doc-keyed attach join
    assert(plan.contains("BroadcastHashJoin"),
           s"vocab join must broadcast:\n$plan")
    // the token explode must partial-aggregate before its (did, word)
    // exchange — the raw token stream never shuffles unaggregated
    assert("partial".r.findAllIn(plan).length >= 1 &&
           "HashAggregate".r.findAllIn(plan).length >= 2,
           s"doc-word counts lost their map-side partial:\n$plan")
  }

  test("bm25TopK: query terms probe the postings by broadcast and the " +
       "candidate stream partial-aggregates before its one exchange") {
    import org.apache.spark.sql.functions._
    // the un-memoized pipeline: a memo hit is a parquet scan with no
    // plan to audit (the memo's own behavior is pinned in MemoSpec)
    val df = analytics.Retrieval.bm25TopKCompute(
      queries.Tables(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", col("doc_id") % 100 === 0, k = 5)
    val plan = executedPlan(df)
    // the enriched query-term table is bounded by |queries| x terms ->
    // its probe of the posting list must be a broadcast hash join
    assert(plan.contains("BroadcastHashJoin"),
           s"query-term probe must broadcast:\n$plan")
    // the (qid, did) score aggregation must keep its map-side partial:
    // the posting-join product never shuffles raw
    assert("partial_sum".r.findAllIn(plan).nonEmpty ||
           ("HashAggregate".r.findAllIn(plan).length >= 2 &&
            "partial".r.findAllIn(plan).nonEmpty),
           s"bm25 candidates lost their map-side partial:\n$plan")
    // no corpus-sized sort-merge anywhere in the probe path: the only
    // joins are the broadcast probe and the bounded df-enrich join
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("unigramSurprisal plans the doc-word subtree once (exchange reuse)" +
       " and keeps the corpus total a broadcast") {
    val df = analytics.TextAnalysis.unigramSurprisal(
      queries.Tables(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text")
    val plan = executedPlan(df)
    // dw feeds both the frequency table and the scoring join: the
    // (did, word) exchange must be planned once and reused, not recomputed
    // from a second scan+explode
    assert(plan.contains("ReusedExchange"),
           s"doc-word exchange must be reused across the wf/scoring branches:\n$plan")
    // the one-row total joins via broadcast nested loop (tiny probe side),
    // never a shuffled cross
    assert(!plan.contains("CartesianProduct"),
           s"corpus total must broadcast, not cartesian:\n$plan")
  }

  test("bigramSurprisal plans the doc-bigram subtree once (exchange " +
       "reuse): the corpus is tokenized exactly one time") {
    val df = analytics.TextAnalysis.bigramSurprisal(
      queries.Tables(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text")
    val plan = executedPlan(df)
    // db feeds both the bigram model and the scoring join: the
    // (did, w1, w2) exchange must be planned once and reused, not
    // recomputed from a second scan + explode
    assert(plan.contains("ReusedExchange"),
           s"doc-bigram exchange must be reused across model/scoring:\n$plan")
    assert(!plan.contains("CartesianProduct"),
           s"no cartesian anywhere:\n$plan")
  }

  test("temperatureSample: the corpus joins the rate table by broadcast " +
       "and never shuffles itself") {
    val df = analytics.Sampling.temperatureSample(
      queries.Tables(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "lang", alpha = 0.7)
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
           s"rate table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
           s"the corpus side must not shuffle for the rate join:\n$plan")
    // the corpus side must reach the join straight from its scan: the
    // only hash exchanges in the plan belong to the k-row group-count
    // subtree (keyed on the group column), never on the corpus key
    assert(!plan.contains("Exchange hashpartitioning(doc_id"),
           s"the corpus must not shuffle on doc_id:\n$plan")
  }

  test("dupShingleCoverage: shingle-df agg keeps its map-side partial; " +
       "no cartesian/self-pair blow-up anywhere") {
    val df = analytics.Dedup.dupShingleCoverage(
      queries.Tables(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text")
    val plan = executedPlan(df)
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
           s"coverage is join+agg only, never a pair product:\n$plan")
    // both the df aggregate and the doc rollup must partial-aggregate
    // before their exchanges (map-side combine on the hot shingle keys)
    assert("partial".r.findAllIn(plan).length >= 2,
           s"df and doc aggregates need map-side partials:\n$plan")
  }
}
