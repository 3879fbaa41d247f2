package graft

import org.apache.spark.sql.functions._

import graft.queries.VisionOps

/** Golden-point geometry for the polygon ROI mask and the real-JPEG
  * decode contract (queries/VisionOps.scala). The driver oracle gates
  * the full query outputs; these pin the semantics a hash can't
  * explain: membership of specific landmark pixels against the
  * reference contour (preprocess_image.py:19), and the reference's
  * own golden filename parse (test/estimate_queue_test.py:30). */
class VisionSpec extends SparkSpec {

  test("ROI half-plane tests classify landmark pixels like cv2.fillPoly would") {
    import spark.implicits._
    // (x, y, expected): all four contour vertices are INSIDE (closed
    // polygon); points above/below the band and right of the sloped
    // edges are OUTSIDE
    val pts = Seq(
      (0, 132, true), (0, 211, true), (1227, 125, true), (1075, 101, true),
      (600, 150, true),   // mid-band
      (0, 100, false),    // above the band at the left edge
      (0, 212, false),    // just below the lower-left vertex
      (1280, 440, false), // far right, below the contour
      (1228, 125, false), // one pixel right of the rightmost vertex
      (640, 0, false))    // top of frame
      .toDF("x", "y", "want")
    val got = pts.withColumn("in_roi",
        VisionOps.insideRoi(col("x").cast("long"), col("y").cast("long")))
      .collect()
    got.foreach { r =>
      assert(r.getAs[Boolean]("in_roi") === r.getAs[Boolean]("want"),
        s"(${r.get(0)}, ${r.get(1)}) misclassified")
    }
  }

  test("q_decode_jpeg pins the reference fixture's golden parse and geometry") {
    val rows = SparkEntry.queries("q_decode_jpeg")(spark, Sf0001).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("station_id") === 41L)
    assert(r.getAs[Long]("obs_epoch") === 1588750800L) // Oslo CEST golden
    assert(r.getAs[Long]("width") === 1280L)
    assert(r.getAs[Long]("height") === 240L)
    assert(r.getAs[Long]("bands") === 3L)
  }
}
