package graft

import graft.operators.Components

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  describe("Components.connectedComponents") {
    it("labels chains transitively and keeps separate clusters apart") {
      // 1-2, 2-3, 3-4 (a path needing propagation) and 10-11 (a pair)
      val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L))
        .toDF("a_id", "b_id")
      val out = Components.connectedComponents(edges, "a_id", "b_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L)
    }

    it("converges on a long path within diameter rounds") {
      val n = 12
      val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong))
        .toDF("a_id", "b_id")
      val out = Components.connectedComponents(edges, "a_id", "b_id", maxIter = n)
        .collect().map(_.getLong(1)).distinct
      out.toSeq shouldBe Seq(1L)
    }

    it("fails loudly when maxIter is below the diameter") {
      val edges = (1 until 12).map(i => (i.toLong, (i + 1).toLong))
        .toDF("a_id", "b_id")
      a[RuntimeException] should be thrownBy
        Components.connectedComponents(edges, "a_id", "b_id", maxIter = 2)
    }
  }
}
