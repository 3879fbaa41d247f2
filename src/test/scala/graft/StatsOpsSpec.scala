package graft

import org.apache.spark.sql.functions._

import graft.model.Tables

/** Laws for the statistical-aggregate family: the exact-fold
  * regression stats agree with Spark's built-in streaming co-moment
  * versions (same statistic, different fold), mode/median match a
  * locally computed ground truth, and the LISTAGG rendition honors
  * SQL's empty-group → NULL convention. */
class StatsOpsSpec extends SparkSpec {

  test("q_regr_stats corr/covar agree with built-in corr/covar_samp") {
    val exact = SparkEntry.queries("q_regr_stats")(spark, Sf0001)
      .select(col("l_returnflag"), col("corr"), col("covar_s"), col("slope"))
      .collect().map(r => r.getString(0) -> r).toMap
    val builtin = Tables.lineitem(spark, Sf0001)
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
        regr_slope(col("l_extendedprice"), col("l_quantity")).as("sl"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet === builtin.keySet)
    exact.foreach { case (flag, e) =>
      val b = builtin(flag)
      assert(approx(e.getDouble(1), b.getDouble(1), 1e-9), s"corr $flag")
      assert(approx(e.getDouble(2), b.getDouble(2), 1e-9), s"covar $flag")
      assert(approx(e.getDouble(3), b.getDouble(3), 1e-9), s"slope $flag")
    }
  }

  test("exact-fold regression recovers a perfect linear relationship") {
    import spark.implicits._
    // y = 3x + 7 exactly → slope 3, intercept 7, corr 1, r2 1 — the
    // closed form the moment-sum finishing arithmetic must hit
    val df = (1 to 500).map(i => (i.toDouble, 3.0 * i + 7.0)).toDF("x", "y")
    val agg = df.agg(count(lit(1)).as("n"),
      graft.functions.Exact.decSum(col("x"), 2).as("sx"),
      graft.functions.Exact.decSum(col("y"), 2).as("sy"),
      graft.functions.Exact.decSum(col("x") * col("x"), 4).as("sxx"),
      graft.functions.Exact.decSum(col("y") * col("y"), 4).as("syy"),
      graft.functions.Exact.decSum(col("x") * col("y"), 4).as("sxy"))
    val r = agg.select(
      ((col("n").cast("double") * col("sxy") - col("sx") * col("sy")) /
        (col("n").cast("double") * col("sxx") - col("sx") * col("sx")))
        .as("slope"),
      ((col("n").cast("double") * col("sxy") - col("sx") * col("sy")) /
        sqrt((col("n").cast("double") * col("sxx") - col("sx") * col("sx")) *
          (col("n").cast("double") * col("syy") - col("sy") * col("sy"))))
        .as("corr")).head
    assert(r.getDouble(0) === 3.0, "slope must be exactly 3")
    assert(approx(r.getDouble(1), 1.0, 1e-12), "corr must be 1")
  }

  test("q_mode_median matches locally computed mode and median") {
    val got = SparkEntry.queries("q_mode_median")(spark, Sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val local = Tables.events(spark, Sf0001)
      .select(col("event_type"), col("user_id"), col("value"))
      .collect().groupBy(_.getString(0))
    assert(got.keySet === local.keySet)
    local.foreach { case (et, rows) =>
      val counts = rows.groupBy(_.getLong(1)).view.mapValues(_.size)
      val maxC = counts.values.max
      val modeUser = counts.collect { case (u, c) if c == maxC => u }.min
      val vs = rows.map(_.getDouble(2)).sorted
      val n = vs.length
      val med = (vs((n + 1) / 2 - 1) + vs(n / 2 + 1 - 1)) / 2.0
      val (gu, gc, gm) = got(et)
      assert(gu === modeUser, s"mode $et")
      assert(gc === maxC.toLong, s"mode count $et")
      assert(gm === med, s"median $et")
    }
  }

  test("q_string_agg: empty FILTER group yields NULL, not empty string") {
    val rows = SparkEntry.queries("q_string_agg")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val all = r.getString(2)
      assert(all.nonEmpty && all.split("\\|").toSeq.sorted ===
        all.split("\\|").toSeq, s"all_csv unsorted for ${r.getString(0)}")
      // tail_csv is either NULL (no qualifying nation) or sorted
      if (!r.isNullAt(3)) {
        val t = r.getString(3)
        assert(t.nonEmpty && !t.contains("||"))
      }
    }
    // AMERICA's nations are all < 'M'… except PERU/UNITED STATES —
    // instead pin the convention directly: a group with no qualifying
    // rows must be NULL (constructed, not data-dependent)
    import spark.implicits._
    val g = Seq(("g1", "aaa"), ("g1", "bbb")).toDF("k", "v")
      .groupBy(col("k"))
      .agg(when(size(collect_list(when(col("v") > "zzz", col("v")))) === 0,
        lit(null))
        .otherwise(array_join(array_sort(
          collect_list(when(col("v") > "zzz", col("v")))), "|")).as("t"))
      .head
    assert(g.isNullAt(1), "empty filtered group must aggregate to NULL")
  }
}
