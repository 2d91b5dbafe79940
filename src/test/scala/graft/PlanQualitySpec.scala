package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan invariants for the judged query suite — the "is this
  * the plan you'd want at 100 TB" checks, locked in as tests:
  *
  *   - scans push their filters into the parquet reader and prune the
  *     read schema to referenced columns (no full-width scans);
  *   - star joins broadcast the small side and never degenerate into
  *     a cartesian product;
  *   - every LSH/banded candidate generator is a hash/merge join on
  *     band keys — a CartesianProduct appearing in one of those plans
  *     means the n² all-pairs regression came back;
  *   - the hot relational path stays inside whole-stage codegen.
  *
  * Plans are rendered AFTER execution so AQE's final plan (broadcast
  * conversions, coalesced shuffles) is what gets asserted.
  */
class PlanQualitySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Executed plan string with AQE finalized. */
  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q_scan_filter pushes filters and prunes columns") {
    val p = plan("q_scan_filter")
    assert(p.contains("PushedFilters: ["), p)
    assert(!p.contains("PushedFilters: []"), p)
    // lineitem has 11 columns; the query projects a small subset, so a
    // full-width ReadSchema means pruning broke
    assert(!p.contains("l_tax"), p)
  }

  test("tpch star joins broadcast dimensions, no cartesian product") {
    for (q <- Seq("q_tpch3", "q_tpch5", "q_tpch10")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q missing broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q has cartesian:\n$p")
    }
  }

  test("banded dedup candidate generators never cross-product") {
    for (q <- Seq("q_dedup_minhash", "q_dedup_simhash", "q_dedup_ngram",
        "q_dedup_embedding_lsh", "q_sim_lsh")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q has nested-loop join:\n$p")
    }
  }

  test("relational aggregates run inside whole-stage codegen") {
    // Under AQE codegen stages only materialize during execution, so
    // codegen-mode explain reports 0 subtrees pre-run; the property
    // under test is codegen-ABILITY, so assert on the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("q1_agg", "q_tpch6", "q_cb_top_types")) {
        val df = SparkEntry.queries(q)(spark, sf)
        val p = df.queryExecution.explainString(
          org.apache.spark.sql.execution.CodegenMode)
        assert(p.contains("WholeStageCodegen subtree") &&
          !p.startsWith("Found 0 WholeStageCodegen"),
          s"$q left codegen:\n${p.take(400)}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("ngram verification joins reuse the shingle-set exchange") {
    // both verify joins shuffle the same `sized` projection; losing
    // ReuseExchange doubles the most expensive scan of the SSJoin
    val p = plan("q_dedup_ngram")
    assert(p.contains("ReusedExchange") || p.contains("reused"),
      s"ngram plan recomputes the shingle projection:\n$p")
  }

  test("tpcds star joins broadcast the part dimension") {
    for (q <- Seq("q_tpcds_pivot", "q_tpcds_rollup_rank",
        "q_tpcds_moving_rank", "q_tpcds_returns_ratio")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q lost its dimension broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
    }
  }

  test("sequence packing never runs a corpus-wide global window") {
    // the pack cumsum must be the bucketed parallel shape: every
    // unpartitioned Window in the plan may only sit above the B-row
    // bucket-totals aggregate, never above a raw corpus scan — a
    // global Window over the documents means the serial one-partition
    // cumsum came back
    val p = plan("q_corpus_pack")
    val globalWindows = p.linesIterator
      .filter(l => l.contains("Window") && !l.contains("windowspecdefinition"))
      .toSeq
    // structural check on the tree text: each Window node line with an
    // empty partition spec must be preceded (deeper subtree) by an
    // aggregate on `bucket`
    val lines = p.linesIterator.toIndexedSeq
    lines.zipWithIndex.foreach { case (l, i) =>
      val isGlobalWindow =
        l.contains("Window [") && !l.contains("partitionspec") &&
          !l.matches(".*Window .*\\[bucket.*") && l.contains("windowspecdefinition()")
      if (isGlobalWindow) {
        val subtree = lines.drop(i + 1).take(8).mkString("\n")
        assert(subtree.contains("HashAggregate") &&
          subtree.contains("bucket"),
          s"global window not over bucket totals:\n$p")
      }
    }
    // and the per-doc cumsum window is partitioned by bucket
    assert(p.contains("windowspecdefinition(bucket"),
      s"pack cumsum lost its bucket partitioning:\n$p")
    assert(globalWindows.nonEmpty || p.contains("Window"),
      s"no window at all in pack plan?\n$p")
  }

  test("budget selection cumsum is the partitioned parallel shape") {
    // same contract as the pack test: the corpus-wide cumsum must run
    // per range partition (windowspecdefinition(__pid ...)); any
    // unpartitioned window may only sit above the B-row partition
    // -totals aggregate, never above the corpus scan
    val p = plan("q_corpus_budget")
    assert(p.contains("windowspecdefinition(__pid"),
      s"budget cumsum lost its per-partition parallelism:\n$p")
    val lines = p.linesIterator.toIndexedSeq
    lines.zipWithIndex.foreach { case (l, i) =>
      if (l.contains("windowspecdefinition()")) {
        val subtree = lines.drop(i + 1).take(8).mkString("\n")
        assert(subtree.contains("HashAggregate") &&
          subtree.contains("__pid"),
          s"global window not over the __pid totals:\n$p")
      }
    }
  }

  test("kmeans assignment broadcasts centroids, update is partial-aggregated") {
    // the only join in each Lloyd iteration is corpus x K broadcast
    // centroids; a sort-merge join or cartesian over the corpus means
    // the map-side argmax shape regressed. The judged query checkpoints
    // per iteration (its final plan shows only the tail), so the lock
    // inspects one iteration step directly.
    import org.apache.spark.sql.functions._
    val e = Tables.df(spark, sf, "embeddings")
    val cent = e.filter(col("vec_id") % 31 === 0 && col("vec_id") < 31L * 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val df = graft.operators.Similarity.kmeansStep(
      e, "vec_id", "embedding", cent)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"kmeans lost its centroid broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"kmeans went cartesian over the corpus:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"kmeans shuffles the corpus for the assignment:\n$p")
    // the per-dimension mean must partial-aggregate before its exchange
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      s"kmeans centroid update lost map-side combine:\n$p")
  }

  test("spatial overlay queries stay scan-local (no joins at all)") {
    // overlay/buffer are pure per-row expressions over one scan —
    // any join or corpus shuffle in these plans is a regression
    for (q <- Seq("q_spatial_overlay", "q_spatial_buffer")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q grew a join:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
    }
  }

  test("bm25 candidates come from the postings join, never a cross product") {
    // queries × corpus must meet ONLY through shared terms (posting
    // lists bound the candidates); a cartesian/nested-loop between the
    // two sides is the all-pairs scoring regression
    val p = plan("q_search_bm25")
    assert(!p.contains("CartesianProduct"), s"bm25 went cartesian:\n$p")
    // the ONE allowed nested-loop join is the 1-row (N, avgdl) corpus
    // stats broadcast; a second one would be a real cross product
    // (count in the final plan only — AQE's toString repeats the tree
    // under "== Initial Plan ==")
    val finalPlan = p.split("== Initial Plan ==")(0)
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(finalPlan).size
    assert(nlj <= 1, s"bm25 has $nlj nested-loop joins:\n$p")
    // query terms meet postings through a hash join on the term
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"bm25 postings join missing:\n$p")
  }

  test("duplicate-span windows are per-document, dedup group is hash-agg") {
    // the island-merge windows must partition by doc id — an
    // unpartitioned window means a corpus-wide serial sort; the
    // duplicate-window detection itself must be a hash aggregate on
    // window hashes, not any kind of self-join
    val p = plan("q_dedup_spans")
    assert(!p.contains("windowspecdefinition()"),
      s"span merge runs a global window:\n$p")
    assert(!p.contains("CartesianProduct"), s"spans went cartesian:\n$p")
    assert(p.contains("HashAggregate"), s"span detection lost hash-agg:\n$p")
  }

  test("decontamination broadcasts the benchmark, corpus side never shuffles early") {
    // the benchmark n-gram set is tiny vs the corpus: the contamination
    // join must be a broadcast hash join, and the only corpus shuffle
    // is the final per-doc aggregate
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"decontamination lost the benchmark broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"decontamination shuffles the corpus for the join:\n$p")
  }

  test("quality classifier is join-free with one map-side-combined shuffle") {
    // weights are an inline rule / broadcast literal, never a join;
    // the only exchange is the per-doc score aggregate
    val p = plan("q_quality_classifier")
    assert(!p.contains("Join"), s"classifier grew a join:\n$p")
    assert(p.contains("partial_sum"),
      s"classifier lost map-side combine:\n$p")
  }

  test("perplexity scoring is broadcast-model, rank is pid-partitioned") {
    // the three model joins and the corpus row must broadcast (the
    // model is top-K-bounded); the tercile rank must come from the
    // parallel-prefix shape — its per-partition window partitions by
    // __pid, and any unpartitioned window may only sit above the
    // B-row partition-totals aggregate, never above corpus rows
    val p = plan("q_text_perplexity")
    assert(!p.contains("CartesianProduct"), s"perplexity cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"perplexity model joins lost their broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"perplexity shuffles the corpus for a model join:\n$p")
    assert(p.contains("windowspecdefinition(__pid"),
      s"perplexity rank lost its __pid partitioning:\n$p")
    // the only nested-loop is the 1-row corpus-N broadcast; AQE's
    // toString prints reused stages expanded, so the same stats join
    // can appear twice — every occurrence must be the BuildRight Cross
    // of that one-row frame, and the scoring exchange must be shared
    // (Reused*) between the rank and partition-totals branches rather
    // than recomputed
    val finalPlan = p.split("== Initial Plan ==")(0)
    val nlj = "BroadcastNestedLoopJoin.*".r.findAllIn(finalPlan).toSeq
    assert(nlj.size <= 2 &&
      nlj.forall(_.contains("BuildRight, Cross")),
      s"perplexity nested-loop joins look wrong:\n$p")
    assert(finalPlan.contains("Reused"),
      s"perplexity scoring exchange is not reused across branches:\n$p")
  }

  test("dsir scoring broadcasts the lambda table, selection is TakeOrdered") {
    // the λ table is bucket-bounded: the scoring join must broadcast;
    // top-k selection must be a TakeOrdered(AndProject), never a
    // global Sort of the corpus scores
    val p = plan("q_dsir_select")
    assert(!p.contains("CartesianProduct"), s"dsir cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"dsir lost the λ broadcast:\n$p")
    assert(p.contains("TakeOrdered"),
      s"dsir top-k is not TakeOrdered:\n$p")
  }

  test("quality-aware dedup windows partition by group") {
    val p = plan("q_dedup_best")
    assert(!p.contains("CartesianProduct"), s"dedup_best cartesian:\n$p")
    assert(!p.contains("windowspecdefinition()"),
      s"dedup_best runs a global window:\n$p")
    assert(p.contains("windowspecdefinition(grp"),
      s"dedup_best argmax window not partitioned by grp:\n$p")
  }

  test("auto-sized LSH keeps the banded join shape at wide shapes") {
    // the scale path (lshAutoParams -> lshCosinePairsScaled) must keep
    // the same hash-join-on-band-keys plan as the fixed contract
    val e = Tables.df(spark, sf, "embeddings")
    val (bands, rows) = graft.operators.Similarity.lshAutoParams(200000L)
    val df = graft.operators.Similarity.lshCosinePairsScaled(
      e, "vec_id", "embedding", 0.9, bands, rows)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"auto LSH went cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"auto LSH has a nested-loop join:\n$p")
  }

  test("asof join is one window over one key exchange, no join node") {
    // the union+window formulation must not plan a join at all, and the
    // only data movement is the hash partition on the key
    val ev = Tables.df(spark, sf, "events")
    val l = ev.filter(org.apache.spark.sql.functions.col("event_type") ===
      "purchase").select("event_id", "user_id", "ts")
    val r = ev.filter(org.apache.spark.sql.functions.col("event_type") ===
      "view").select(org.apache.spark.sql.functions.col("user_id"),
      org.apache.spark.sql.functions.col("ts"),
      org.apache.spark.sql.functions.col("event_id").as("vid"))
    val df = graft.operators.Temporal.asofJoin(l, r, Seq("user_id"),
      "ts", "ts", Seq("vid"), "vts", rightTieBreak = Seq("vid"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"asof join planned a join node:\n$p")
    // AQE materializes the one logical key shuffle as an exchange per
    // union leg (each row still moves exactly once); >2 would mean a
    // second repartitioning crept in after the window
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges >= 1 && exchanges <= 2,
      s"asof join has $exchanges key exchanges:\n$p")
    assert(p.contains("Window"), p)
  }

  test("range and spatial grid joins are equi joins, never nested-loop") {
    for (q <- Seq("q_join_range_bin", "q_spatial_grid_join",
        "q_join_interval")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q has nested-loop join:\n$p")
    }
  }

  test("pagerank iterations and hll sketches never cross-product") {
    for (q <- Seq("q_graph_pagerank", "q_stats_hll")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q has nested-loop join:\n$p")
    }
  }

  test("gapfill grid explode stays distributed, window is key-partitioned") {
    val p = plan("q_ts_gapfill")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("windowspecdefinition()"),
      s"gapfill runs a global window:\n$p")
  }

  test("round-9 TPC-DS/ClickBench shapes: no cartesian, no nested loop") {
    // correlated EXISTS gates must decorrelate to hash joins; growth
    // self-joins and cumulative FULL OUTER must stay equi-join shaped
    for (q <- Seq("q_tpcds_over_avg", "q_tpcds_yoy_growth",
        "q_tpcds_exists", "q_tpcds_cumulative", "q_tpcds_stddev",
        "q_tpcds_count_band", "q_tpcds_two_rank",
        "q_cb_sessions", "q_cb_first_last")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q has nested-loop join:\n$p")
    }
    // the EXISTS/NOT EXISTS pair decorrelates to semi/anti hash joins
    val pe = plan("q_tpcds_exists")
    assert(pe.contains("LeftSemi") && pe.contains("LeftAnti"),
      s"EXISTS gates did not decorrelate:\n$pe")
  }

  test("wide-shape LSH keeps the banded equi join, never all-pairs") {
    val p = plan("q_dedup_embedding_lsh_wide")
    assert(!p.contains("CartesianProduct"), s"wide LSH cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"wide LSH nested-loop:\n$p")
  }

  test("quantified ANY stays hash-shaped: scalar aggregates, no theta join") {
    // the op-aware expansion must plan the correlated `< ANY` as a
    // per-key max aggregate joined by hash, and the NULL-member /
    // set-nonempty checks as scalar subqueries or hash existence
    // joins — a BroadcastNestedLoopJoin here means the expansion
    // regressed to per-row theta coupling
    val p = plan("q_quantified_any")
    assert(p.contains("ExistenceJoin"), s"expansion missing:\n$p")
    assert(p.contains("max("), s"order-op did not collapse to max():\n$p")
    assert(!p.contains("CartesianProduct"), s"quantified ANY cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"quantified ANY nested-loop:\n$p")
  }

  test("expanded NOT IN never theta-couples the UNKNOWN branch") {
    // the fuzz grammar's degenerate correlation predicates (a literal
    // inner leaf: `0 = outer % 6`) legitimately plan as nested-loop
    // existence joins over the 5-row region table — the regression
    // signature specific to the IN expansion is a nested-loop join
    // whose CONDITION is the fused `isnull(v = x)` probe coupling,
    // which the scalar decomposition exists to prevent
    val p = plan("q_fn_fuzz_in")
    assert(p.contains("ExistenceJoin"), s"expansion missing:\n$p")
    assert(!p.contains("CartesianProduct"), s"fuzz_in cartesian:\n$p")
    val coupled = p.linesIterator.filter(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("isnull(("))
    assert(coupled.isEmpty,
      s"fuzz_in theta-coupled unknown branch:\n${coupled.mkString("\n")}")
  }

  test("row-id reconstruction is a broadcast join, never a sort-merge") {
    // the range table is O(files + delete-holes) — metadata-sized at
    // any corpus size. A SortMergeJoin here would shuffle the full
    // table by file path; the 100 TB plan is broadcast + residual
    // range predicate
    import graft.lake._
    import org.apache.spark.sql.functions._
    val df = spark.range(1, 2001).coalesce(2)
      .selectExpr("id AS x", "id % 7 AS y")
    val t = LakeTable.create(spark, LakeEngine.tempLocation("pq_rid"),
      "t", df.schema, properties = Map("row_ids" -> "true"))
    t.append(df)
    t.delete(col("x") % 5 === 0)
    val read = t.readWithRowIds()
    read.collect()
    val p = read.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"row-id join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"row-id join shuffled:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }
}
