package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import graft.ml.AdaBoostMH

/** R1 ingest -> R4 stump search end-to-end: the FIXTURES §3 examples written
  * as a text file must train to the same golden stump. */
class MultiLabelTextSuite extends SparkSpec {

  private def fixtureFile: String = {
    val f = Files.createTempFile("mlpoints", ".txt")
    // FIXTURES §3: labels encoded as the positive set of the +-1 vectors
    Files.writeString(f,
      """# hand-computed AdaBoost.MH fixture (K=2, dim=2)
        |0 0:1.0 1:5.0
        |0 0:2.0 1:8.0
        |1 0:3.0 1:6.0
        |
        |- 0:4.0 1:7.0
        |""".stripMargin)
    f.toString
  }

  test("parses labels, sparse features, comments, blanks and the empty set") {
    val ds = MultiLabelText.read(spark, fixtureFile, dim = 2, numLabels = 2)
    val rows = ds.collect().sortBy(_.features(0))
    assert(rows.length === 4)
    assert(rows(0).labels.toSeq === Seq(0))
    assert(rows(3).labels.toSeq === Seq.empty)
    assert(rows(1).features.toSeq === Seq(2.0, 8.0))
  }

  test("malformed fields fail loudly with the line quoted") {
    val e = intercept[IllegalArgumentException] {
      MultiLabelText.parseLine("0 0=1.5", dim = 2, numLabels = 2)
    }
    assert(e.getMessage.contains("0=1.5"))
    val e2 = intercept[IllegalArgumentException] {
      MultiLabelText.parseLine("7 0:1.0", dim = 2, numLabels = 2)
    }
    assert(e2.getMessage.contains("out of range"))
  }

  test("ingested fixture trains to the FIXTURES §3 golden stump") {
    val ds = MultiLabelText.read(spark, fixtureFile, dim = 2, numLabels = 2)
    val pts = MultiLabelText.toTrainPoints(ds, numLabels = 2)
    val grids = Array(Array(1.5, 2.5, 3.5), Array(5.5, 6.5, 7.5))
    val stumps = AdaBoostMH.trainCore(spark, pts, grids, numBins = 4, k = 2, numRounds = 1)
    assert(stumps.head.featureIndex === 0)
    assert(stumps.head.threshold === 2.5)
    assert(stumps.head.votes.toSeq === Seq(-1, 1))
    assert(math.abs(stumps.head.alpha - 0.9729550745276566) < 1e-12)
  }
}
