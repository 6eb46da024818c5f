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

  describe("Components.connectedComponentsContraction") {
    def labelsOf(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] =
      Components.connectedComponentsContraction(
        edges.toDF("a_id", "b_id"), "a_id", "b_id", maxIter)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    it("handles a diameter far beyond propagation's round budget") {
      // path of 200 vertices: propagation needs ~200 rounds; contraction
      // halves diameter per round → well under 25
      val edges = (1 until 200).map(i => (i.toLong, (i + 1).toLong))
      labelsOf(edges) shouldBe (1L to 200L).map(_ -> 1L).toMap
    }

    it("property: equals label propagation on varied graph shapes") {
      // deterministic pseudo-random graphs: chains, cliques, stars and
      // LCG-driven sparse graphs, several seeds each
      def lcg(seed: Long): Iterator[Long] =
        Iterator.iterate(seed)(x => (x * 6364136223846793005L + 1442695040888963407L))
      val shapes: Seq[Seq[(Long, Long)]] = Seq(
        (1 until 40).map(i => (i.toLong, (i + 1).toLong)),       // chain
        (for (i <- 1 to 8; j <- i + 1 to 8) yield (i.toLong, j.toLong)), // clique
        (2 to 30).map(i => (1L, i.toLong)),                      // star
        Seq((1L, 1L), (2L, 2L), (3L, 4L))                        // self-loops + pair
      ) ++ (1 to 3).map { seed =>
        lcg(seed.toLong).drop(1).take(120).grouped(2).collect {
          case Seq(x, y) => (math.floorMod(x, 60).toLong, math.floorMod(y, 60).toLong)
        }.toSeq
      }
      shapes.zipWithIndex.foreach { case (edges, i) =>
        val nonLoop = edges.filter(e => e._1 != e._2)
        if (nonLoop.nonEmpty) {
          val prop = Components.connectedComponents(
            nonLoop.toDF("a_id", "b_id"), "a_id", "b_id", maxIter = 60)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          withClue(s"shape $i: ") { labelsOf(nonLoop) shouldBe prop }
        }
      }
    }

    it("keeps disjoint clusters apart and covers every vertex") {
      val out = labelsOf(Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)))
      out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L)
    }
  }
}
