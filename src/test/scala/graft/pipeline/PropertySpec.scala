package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5): chunk coverage, offset bounds,
 * dedup idempotence, CC permutation-invariance, similarity bounds.
 * (scalacheck generators sampled with fixed seeds; the scalatestplus bridge
 * is not in the offline dependency cache.) */
class PropertySpec extends AnyFunSuite {
  import SparkHolder.spark
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("chunking covers every character and offsets stay in bounds") {
    val cases = Gen.zip(Gen.choose(1, 1200), Gen.choose(50, 300), Gen.choose(0, 49))
    samples(cases, 15).foreach { case (len, size, overlap) =>
      val text = "x" * len
      val chunks = Detect.chunks(
        spark.createDataset(Seq(SourceFile("r", "p", "c", "java", text))),
        size, overlap).collect()
      val covered = chunks.flatMap(c =>
        c.chunkStart until (c.chunkStart + c.chunkText.length)).toSet
      assert(covered == (0 until len).toSet, s"len=$len size=$size overlap=$overlap")
      chunks.foreach { c =>
        assert(c.chunkStart >= 0 && c.chunkStart + c.chunkText.length <= len)
        assert(c.chunkText == text.substring(c.chunkStart, c.chunkStart + c.chunkText.length))
      }
    }
  }

  test("gazetteer offsets always select the exact surface at word boundaries") {
    val words = Gen.listOfN(30, Gen.oneOf("alpha", "brookfall", "beta", "lumina",
      "lumina language", "gamma", "mercury"))
    val g = Gazetteer.build(Seq("brookfall", "lumina", "lumina language", "mercury"))
    samples(words, 25).foreach { ws =>
      val text = ws.mkString(" ")
      g.findMentions(text).foreach { m =>
        assert(text.substring(m.start, m.end).toLowerCase == m.pattern)
        assert(m.start == 0 || !Character.isLetterOrDigit(text.charAt(m.start - 1)))
        assert(m.end == text.length || !Character.isLetterOrDigit(text.charAt(m.end)))
      }
    }
  }

  private val tripleGen: Gen[Triple] = for {
    s <- Gen.oneOf("A", "B", "C", "D")
    p <- Gen.oneOf("uses", "part of", "member of", "related to", "related too")
    o <- Gen.oneOf("A", "B", "C", "D")
    inf <- Gen.oneOf("explicit", "implicit")
    d <- Gen.oneOf("d1", "d2", "d3")
  } yield Triple(s, p, o, inf, "T", "T", "explicit", "explicit", d, "java")

  test("dedup chain is idempotent; survivors per pair are pairwise-dissimilar predicates") {
    samples(Gen.listOfN(25, tripleGen), 8).foreach { ts =>
      val ds = spark.createDataset(ts)
      val once = Dedup.all(ds).collect().toSet
      val twice = Dedup.all(spark.createDataset(once.toSeq)).collect().toSet
      assert(once == twice)
      // reference semantics (deduplication_utils.py + semantic_dedup_utils.py):
      // per undirected pair, one survivor per predicate CLUSTER — so surviving
      // predicates of a pair must be pairwise < 0.85 similar, and distinct
      once.toSeq.groupBy(t =>
        if (t.subject <= t.obj) (t.subject, t.obj) else (t.obj, t.subject))
        .foreach { case (_, rels) =>
          val preds = rels.map(_.predicate)
          assert(preds.distinct.size == preds.size)
          for (Seq(p1, p2) <- preds.combinations(2))
            assert(RatcliffObershelp.ratio(p1, p2) < 0.85, s"$p1 ~ $p2")
        }
    }
  }

  test("connected components: permutation invariance, closure, min representative") {
    val edgeGen = Gen.listOfN(12,
      Gen.zip(Gen.oneOf("a", "b", "c", "d", "e", "f"), Gen.oneOf("a", "b", "c", "d", "e", "f")))
    def cc(edges: Seq[(String, String)]): Map[String, String] =
      Canonicalize.connectedComponents(edges.toDF("src", "dst"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    samples(edgeGen, 5).foreach { es =>
      val m1 = cc(es)
      val m2 = cc(new scala.util.Random(7).shuffle(es))
      assert(m1 == m2)
      es.foreach { case (a, b) => assert(m1(a) == m1(b)) }
      m1.groupBy(_._2).foreach { case (rep, members) =>
        assert(members.keys.min == rep)
      }
    }
  }

  test("Ratcliff/Obershelp is bounded and identity-maximal") {
    val strGen = Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)
    samples(Gen.zip(strGen, strGen), 200).foreach { case (a, b) =>
      val r = RatcliffObershelp.ratio(a, b)
      assert(r >= 0.0 && r <= 1.0)
      assert(RatcliffObershelp.ratio(a, a) == 1.0)
    }
  }
}
