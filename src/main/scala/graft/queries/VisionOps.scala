package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Round-12 vision-fidelity wave: the two reference image-path gaps
  * the round-10 verdict ranked highest.
  *
  * 1. `q_decode_jpeg` exercises the JPEG branch of the real decode
  *    chain on the reference's own webcam fixture
  *    (reference: test/data/station_id_41_20200506T094000.jpg;
  *    decode at queue_time_predictions/preprocess_image.py:36-54,
  *    `cv2.imdecode(..., IMREAD_COLOR)` at :52). Every other decode
  *    query synthesizes PNG for oracle losslessness; this one pins a
  *    lossy-tolerant contract — dimensions, channel count, and
  *    integer-floored channel means — over actual JPEG bytes.
  *
  * 2. `q_roi_mask` is the non-rectangular region-of-interest mask
  *    (reference: preprocess_image.py:57-79 `paint_everything_outside_ROI`,
  *    `cv2.drawContours` fill of the 4-gon ROI at :19). cv2
  *    rasterizes; this engine states the same geometry as four
  *    half-plane tests over the convex contour — closed-form integer
  *    arithmetic, so DuckDB can restate it as a CASE and the mask is
  *    bit-identical cross-engine. At 100 TB the mask is a narrow
  *    per-row projection: no shuffle, no UDF, stays inside
  *    whole-stage codegen.
  */
object VisionOps {

  /** The reference ROI contour, verbatim (preprocess_image.py:19):
    * `[[0, 132], [0, 211], [1227, 125], [1075, 101]]` — x left-to-
    * right, y top-to-bottom, listed in contour order (clockwise in
    * image coordinates). Convexity was checked offline: all four
    * edge-pair cross products share a sign, so point-in-polygon
    * reduces to "every edge cross product ≤ 0". */
  val Roi: Seq[(Int, Int)] = Seq((0, 132), (0, 211), (1227, 125), (1075, 101))

  /** Half-plane test: for edge Pi→Pj, cross = (xj−xi)(y−yi) − (yj−yi)(x−xi).
    * Interior (and boundary) points satisfy cross ≤ 0 on every edge of
    * this clockwise contour. Pure integer Column arithmetic. */
  def insideRoi(x: Column, y: Column, poly: Seq[(Int, Int)] = Roi): Column =
    poly.indices.map { i =>
      val (xi, yi) = poly(i)
      val (xj, yj) = poly((i + 1) % poly.size)
      (lit(xj - xi) * (y - lit(yi)) - lit(yj - yi) * (x - lit(xi))) <= 0
    }.reduce(_ && _)

  /** The same four half-plane tests as SQL text (for the oracle). */
  def insideRoiSql(x: String, y: String, poly: Seq[(Int, Int)] = Roi): String =
    poly.indices.map { i =>
      val (xi, yi) = poly(i)
      val (xj, yj) = poly((i + 1) % poly.size)
      s"(${xj - xi} * (($y) - $yi) - ${yj - yi} * (($x) - $xi) <= 0)"
    }.mkString("(", " AND ", ")")

  /** A small convex clockwise contour sized for the synthetic
    * 8..15 × 8..11 fixture images (the reference contour spans
    * 1280×720 and would cover or miss a tiny frame entirely).
    * Convexity checked like [[Roi]]: all edge-pair crosses negative. */
  val SmallRoi: Seq[(Int, Int)] = Seq((0, 2), (0, 9), (12, 6), (10, 1))

  val all: Seq[QueryDef] = Seq(

    // --- ROI PAINT ON REAL PIXELS (P1 on actual image bytes): the
    // full `paint_everything_outside_ROI` semantics over genuine PNG
    // streams — synth encode → REAL ImageIO decode → per-pixel
    // half-plane classification inside the native PngRoiStats kernel
    // → per-image in/out channel accounting, plus the painted
    // composite (outside painted white = 255, np.where semantics,
    // preprocess_image.py:74-76). PNG losslessness + the closed-form
    // fixture colors make the whole chain analytically oracle-gated;
    // q_roi_mask covers the reference contour on frame coordinates,
    // this covers masking applied to decoded rasters. Per-row narrow
    // map: no shuffle before the per-doc rollup, kernel inside
    // whole-stage codegen.
    QueryDef("q_roi_paint",
      (spark, dir) => {
        import org.apache.spark.sql.graftbridge.GraftColumns.{column => gc, expression => ge}
        val png = gc(graft.functions.PngSynth(ge(col("doc_id"))))
        val wh = expr("(8 + doc_id % 8) * (8 + doc_id % 4)")
        // sort first (the one range exchange the query always paid),
        // encode/decode after (guide §2.5) — see q_multimodal_decode
        graft.util.Par.sortedFanOut(
          Tables.documents(spark, dir).select(col("doc_id")),
          col("doc_id"))
          .select(col("doc_id"), png.as("payload"))
          .select(col("doc_id"),
            gc(graft.functions.PngRoiStats(ge(col("payload")), SmallRoi))
              .as("st"))
          .select(col("doc_id"),
            element_at(col("st"), 1).as("n_in"),
            element_at(col("st"), 2).as("sum_r_in"),
            element_at(col("st"), 3).as("sum_g_in"),
            element_at(col("st"), 4).as("sum_b_in"),
            (element_at(col("st"), 2) +
              lit(255L) * (wh - element_at(col("st"), 1))).as("painted_r"),
            (element_at(col("st"), 3) +
              lit(255L) * (wh - element_at(col("st"), 1))).as("painted_g"),
            (element_at(col("st"), 4) +
              lit(255L) * (wh - element_at(col("st"), 1))).as("painted_b"))
        // total order already established by sortedFanOut (unique doc_id)
      },
      Some(s"""WITH d AS (
  SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 4 AS h
  FROM documents),
px AS (
  SELECT doc_id, p % w AS x, p // w AS y
  FROM (SELECT doc_id, w, h, unnest(range(w * h)) AS p FROM d)),
c AS (
  SELECT doc_id, ${insideRoiSql("x", "y", SmallRoi)} AS ins,
    (31 * x + 17 * y + doc_id) % 256 AS r,
    (13 * x + 7 * y + 2 * doc_id) % 256 AS g,
    (5 * x + 3 * y + 3 * doc_id) % 256 AS b
  FROM px)
SELECT doc_id,
  CAST(sum(CASE WHEN ins THEN 1 ELSE 0 END) AS BIGINT) AS n_in,
  CAST(sum(CASE WHEN ins THEN r ELSE 0 END) AS BIGINT) AS sum_r_in,
  CAST(sum(CASE WHEN ins THEN g ELSE 0 END) AS BIGINT) AS sum_g_in,
  CAST(sum(CASE WHEN ins THEN b ELSE 0 END) AS BIGINT) AS sum_b_in,
  CAST(sum(CASE WHEN ins THEN r ELSE 255 END) AS BIGINT) AS painted_r,
  CAST(sum(CASE WHEN ins THEN g ELSE 255 END) AS BIGINT) AS painted_g,
  CAST(sum(CASE WHEN ins THEN b ELSE 255 END) AS BIGINT) AS painted_b
FROM c GROUP BY doc_id ORDER BY doc_id""")),

    // --- REAL-JPEG DECODE (S2, the lossy branch): stage the
    // reference webcam frame from the library's own resources into a
    // scratch dir, read it back through the binaryFile source (the
    // same S1 prefix-scan shape as q_binary_source), decode with the
    // native ImageIO expression, and parse the reference filename
    // pattern (station 41, Oslo-local 20200506T094000 → POSIX
    // 1588750800, the reference's golden parse at
    // test/estimate_queue_test.py:30). The contract is deliberately
    // lossy-tolerant: exact width/height/band-count plus channel
    // means floored to integers — no pixel hash, because JPEG decode
    // is only bit-stable per decoder. The oracle states the expected
    // constants in closed form.
    QueryDef("q_decode_jpeg",
      (spark, dir) => {
        import org.apache.spark.sql.graftbridge.GraftColumns.{column => gc, expression => ge}
        val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
        val stage = java.nio.file.Paths.get(wh, "graft-jpeg")
        java.nio.file.Files.createDirectories(stage)
        val name = "station_id_41_20200506T094000.jpg"
        val dst = stage.resolve(name)
        if (!java.nio.file.Files.exists(dst)) {
          val in = getClass.getResourceAsStream(s"/fixtures/$name")
          try java.nio.file.Files.copy(in, dst) finally in.close()
        }
        val keyRe = "station_id_([0-9]+)_([0-9T]+)\\.jpg"
        spark.read.format("binaryFile")
          .option("pathGlobFilter", "*.jpg").load(stage.toString)
          .select(regexp_extract(col("path"), "([^/]+)$", 1).as("file"),
            col("content"))
          .select(col("file"),
            regexp_extract(col("file"), keyRe, 1).cast("long").as("station_id"),
            graft.functions.Estimate.osloEpoch(
              regexp_extract(col("file"), keyRe, 2)).as("obs_epoch"),
            gc(graft.functions.PngDecodeStats(ge(col("content")))).as("st"))
          .select(col("file"), col("station_id"), col("obs_epoch"),
            element_at(col("st"), 1).as("width"),
            element_at(col("st"), 2).as("height"),
            element_at(col("st"), 3).as("bands"),
            expr("st[3] div (st[0] * st[1])").as("mean_r"),
            expr("st[4] div (st[0] * st[1])").as("mean_g"),
            expr("st[5] div (st[0] * st[1])").as("mean_b"))
      },
      Some("""SELECT 'station_id_41_20200506T094000.jpg' AS file,
  CAST(41 AS BIGINT) AS station_id, CAST(1588750800 AS BIGINT) AS obs_epoch,
  CAST(1280 AS BIGINT) AS width, CAST(240 AS BIGINT) AS height,
  CAST(3 AS BIGINT) AS bands, CAST(107 AS BIGINT) AS mean_r,
  CAST(115 AS BIGINT) AS mean_g, CAST(109 AS BIGINT) AS mean_b""")),

    // --- POLYGON ROI MASK (P1, the non-rectangular case): each row
    // is one sampled pixel of the 1280×720 webcam frame (the
    // deterministic raster order walk event_id → (x, y)), classified
    // by the four half-plane tests, then painted: inside keeps its
    // closed-form synthetic luma, outside is painted white (255) —
    // exactly `paint_everything_outside_ROI`'s np.where semantics.
    // The bbox flag is the reference's crop_image companion
    // (preprocess_image.py:82-105: the minimal rectangle containing
    // the ROI — x∈[0,1227], y∈[101,211]). The rollup pins the
    // aggregate geometry (ROI area ≈ band between the two chords) so
    // a single flipped half-plane cannot pass.
    QueryDef("q_roi_mask",
      (spark, dir) => {
        // integer raster walk (div, not fractional /): both engines
        // state the identical arithmetic
        val x = expr("event_id % 1280")
        val y = expr("(event_id div 1280) % 720")
        val luma = (lit(31L) * x + lit(17L) * y) % 256
        val inside = insideRoi(x, y)
        val inBbox = x >= 0 && x <= 1227 && y >= 101 && y <= 211
        Tables.events(spark, dir)
          .select(col("event_id"), x.as("x"), y.as("y"),
            inside.as("in_roi"), inBbox.as("in_bbox"),
            when(inside, luma).otherwise(lit(255L)).as("masked_luma"))
          .orderBy(col("event_id"))
      },
      Some(s"""SELECT event_id, x, y,
  ${insideRoiSql("x", "y")} AS in_roi,
  (x >= 0 AND x <= 1227 AND y >= 101 AND y <= 211) AS in_bbox,
  CASE WHEN ${insideRoiSql("x", "y")}
       THEN (31 * x + 17 * y) % 256 ELSE 255 END AS masked_luma
FROM (SELECT event_id, CAST(event_id % 1280 AS BIGINT) AS x,
        CAST((event_id // 1280) % 720 AS BIGINT) AS y FROM events)
ORDER BY event_id""")),
  )
}
