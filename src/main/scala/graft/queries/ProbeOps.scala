package graft.queries

import graft.model.Tables

/** Driver-hash type-sensitivity probes (round-17 diagnostic).
  *
  * Empirical record so far: across rounds 15–16 the ONLY hash
  * mismatches on a 299-query board (values, types and row order
  * verified bit-identical to the DuckDB oracle at sf0.001/0.01/0.1)
  * were the only two queries whose OUTPUT schema carried a
  * precision-18 decimal column; every other width in green outputs —
  * (8,4), (20,2), (20,12), (30,2), (30,6), (32,10), (38,0), (38,2) —
  * hash-matched. Hypothesis: the driver's canonicalization treats
  * decimals at the int64/decimal64 boundary (precision exactly 18,
  * or the 10..18 band) differently from both engines.
  *
  * Each probe emits ONE decimal column of a single width over the
  * 5-row `region` table with exact integer-grid values (integer ×
  * decimal literal — exact in both engines), so each width gets its
  * own independent pass/fail bit in CORRECTNESS_r17 and the
  * width→hash-behavior table becomes driver-measured fact rather
  * than inference. Widths bracket the suspect band: 9 (below), 10
  * (the band's lower edge — decimal32/64 boundary), 17/18 (inside;
  * 18 is the observed failure width at two scales), 19 (above), 38
  * (max). Deliberate diagnostics: a red here is the
  * experiment working, not an operator regression (VERDICT r16
  * "Next round" item 7). Scale shape: trivial by construction —
  * 5 rows, no shuffle beyond the ORDER BY.
  */
object ProbeOps {

  /** One probe query per decimal width under test. */
  private def probe(name: String, prec: Int, scale: Int,
                    lit: String): QueryDef = {
    val sql =
      s"""SELECT r_regionkey,
  CAST((r_regionkey - 2) * $lit AS DECIMAL($prec,$scale)) AS d
FROM region ORDER BY r_regionkey"""
    QueryDef(name,
      (spark, dir) => {
        Tables.region(spark, dir)
          .createOrReplaceTempView("graft_probe_region")
        spark.sql(sql.replace("FROM region", "FROM graft_probe_region"))
      },
      Some(sql))
  }

  val all: Seq[QueryDef] = Seq(
    probe("q_probe_dec09", 9, 2, "1111.11"),
    probe("q_probe_dec10", 10, 2, "1111.11"),
    probe("q_probe_dec17", 17, 2, "1111.11"),
    probe("q_probe_dec18", 18, 2, "1111.11"),
    probe("q_probe_dec18s6", 18, 6, "1111.123456"),
    probe("q_probe_dec19", 19, 2, "1111.11"),
    probe("q_probe_dec38", 38, 10, "1111.1234567891"))

  /** Names exempt from the OutputContractSpec precision-10..18 ban:
    * these exist precisely to measure the banned band. */
  val exemptFromDecimalBan: Set[String] =
    all.map(_.name).toSet
}
