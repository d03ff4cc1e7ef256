package graft.pipeline

import scala.collection.mutable

/**
 * Serializable Aho-Corasick multi-pattern matcher with word-boundary and
 * longest-match-wins semantics — the mention detector that replaces the
 * reference's per-document extraction LLM call (reference:
 * entityextractor/services/openai_service.py:24-131). Built once on the
 * driver from the KB alias index and broadcast to executors; matching is a
 * single O(text) pass per document regardless of dictionary size, which is
 * what makes mention detection shuffle-free and embarrassingly parallel at
 * 100 TB scale (SURVEY.md §2.10).
 *
 * Matching is case-insensitive (patterns are stored normalized lowercase).
 *
 * SCALE REPRESENTATION (round 4): the automaton ships as flat CSR arrays —
 * sorted (char, target) edge lists per state plus fail/output arrays — so
 * the broadcast payload is ~12 bytes/edge with zero boxed collections; at a
 * 10^6-alias dictionary (~10^7 states) that is ~100 MB, where the previous
 * Array[Map[Char, Int]] representation serialized to multiple GB. The dense
 * ASCII delta table (goto+fail folded into two array loads per char) is
 * rebuilt lazily per executor ONLY while states ≤ [[Gazetteer.DenseMaxStates]]
 * (128·4 B per state: ≤ 128 MB); above that the matcher runs the CSR
 * goto+fail walk directly — a binary search over a state's sorted edges per
 * character, which is the documented cutover from "small dictionary, dense
 * DFA" to "web-scale dictionary, compact automaton". Both paths are pinned
 * byte-identical by GazetteerSpec's randomized brute-force oracle.
 */
final class Gazetteer private (
    private val edgeChars: Array[Char], // CSR: edges sorted by char per state
    private val edgeTargets: Array[Int],
    private val stateOffsets: Array[Int], // length nStates + 1
    private val fail: Array[Int],
    private val outFlat: Array[Int], // CSR: pattern indices per state
    private val outOffsets: Array[Int], // length nStates + 1
    val patterns: Array[String],
    private val denseEnabled: Boolean) extends Serializable {

  def nStates: Int = fail.length

  /** Approximate in-memory footprint of the shipped sparse automaton. */
  def sparseBytes: Long =
    2L * edgeChars.length + 4L * edgeTargets.length + 4L * stateOffsets.length +
      4L * fail.length + 4L * outFlat.length + 4L * outOffsets.length +
      patterns.map(_.length * 2L + 40L).sum

  /** A matched span in document coordinates; end is exclusive. */
  final case class Match(start: Int, end: Int, patternIdx: Int) {
    def pattern: String = patterns(patternIdx)
  }

  @inline private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** goto(s, c) in the CSR edge lists: binary search the state's sorted
   * edges; -1 = no edge. */
  @inline private def gotoState(s: Int, c: Char): Int = {
    var lo = stateOffsets(s)
    var hi = stateOffsets(s + 1) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mc = edgeChars(mid)
      if (mc == c) return edgeTargets(mid)
      else if (mc < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /**
   * Dense DFA over the ASCII plane: delta(s)(c) resolves goto+fail in TWO
   * array loads. `@transient lazy`: rebuilt once per executor JVM after
   * broadcast deserialization (states × 128 ints) instead of shipping it.
   * GATED: null (CSR walk instead) when the table would exceed
   * [[Gazetteer.DenseMaxStates]] · 128 ints — a 10^6-alias dictionary must
   * ship AND run sparse, which this layout makes first-class rather than a
   * comment's promise.
   */
  @transient private lazy val delta: Array[Array[Int]] =
    if (!denseEnabled || nStates > Gazetteer.DenseMaxStates) null
    else {
      val d = Array.ofDim[Int](nStates, 128)
      var c = 0
      while (c < 128) {
        val t = gotoState(0, c.toChar)
        d(0)(c) = if (t >= 0) t else 0
        c += 1
      }
      // BFS order: fail(r) is strictly shallower, so delta(fail(r)) is ready
      val queue = new java.util.ArrayDeque[Int]()
      var i = stateOffsets(0)
      while (i < stateOffsets(1)) { queue.add(edgeTargets(i)); i += 1 }
      while (!queue.isEmpty) {
        val r = queue.poll()
        var ch = 0
        while (ch < 128) {
          val t = gotoState(r, ch.toChar)
          d(r)(ch) = if (t >= 0) t else d(fail(r))(ch)
          ch += 1
        }
        var e = stateOffsets(r)
        while (e < stateOffsets(r + 1)) { queue.add(edgeTargets(e)); e += 1 }
      }
      d
    }

  /** CSR goto+fail walk for one character (the dense-exceeding path and the
   * non-ASCII path). */
  @inline private def stepSparse(state0: Int, c: Char): Int = {
    var s = state0
    var nx = gotoState(s, c)
    while (s != 0 && nx < 0) { s = fail(s); nx = gotoState(s, c) }
    if (nx >= 0) nx else 0
  }

  /** All word-boundary-valid matches, reduced to non-overlapping
   * longest-match-wins (leftmost-longest), sorted by start offset.
   * @param atDocStart text position 0 is a REAL document start (a word
   * boundary); false when the text is an interior chunk whose first char
   * may be mid-word — matches touching that edge are suppressed (the
   * overlapping neighbor chunk sees them with real context)
   * @param atDocEnd same for the text's end */
  def findMentions(text: String, atDocStart: Boolean = true,
      atDocEnd: Boolean = true): Vector[Match] = {
    val raw = Vector.newBuilder[Match]
    val dfa = delta
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = Character.toLowerCase(text.charAt(i))
      state =
        if (dfa != null && c < 128) dfa(state)(c)
        else stepSparse(state, c)
      var oi = outOffsets(state)
      val oe = outOffsets(state + 1)
      while (oi < oe) {
        val p = outFlat(oi)
        val start = i + 1 - patterns(p).length
        val okLeft =
          if (start == 0) atDocStart else !isWordChar(text.charAt(start - 1))
        val okRight =
          if (i + 1 >= n) atDocEnd else !isWordChar(text.charAt(i + 1))
        if (okLeft && okRight) raw += Match(start, i + 1, p)
        oi += 1
      }
      i += 1
    }
    // leftmost-longest, non-overlapping
    val sorted = raw.result().sortBy(m => (m.start, -(m.end - m.start)))
    val kept = Vector.newBuilder[Match]
    var lastEnd = -1
    sorted.foreach { m =>
      if (m.start >= lastEnd) { kept += m; lastEnd = m.end }
    }
    kept.result()
  }
}

object Gazetteer {

  /** Dense-DFA cutover: states × 128 × 4 B ≤ 128 MB per executor. Below the
   * threshold (every KB up to ~10^4-10^5 aliases, incl. the full toy KB and
   * the 10^5-alias synthetic KB's shared prefixes) matching takes the
   * two-load dense path; above it the CSR walk runs directly. */
  val DenseMaxStates: Int = 1 << 18

  /** Build from normalized lowercase patterns (duplicates collapse).
   * @param dense allow the per-executor dense ASCII DFA (still subject to
   * [[DenseMaxStates]]); false forces the CSR walk — the path a web-scale
   * dictionary takes — and exists so specs can pin both paths identical. */
  def build(patternsIn: Seq[String], dense: Boolean = true): Gazetteer = {
    // char-wise lowercase — the SAME transform findMentions applies to text
    // (String.toLowerCase uses the default locale: on a tr-TR JVM pattern
    // 'Istanbul' would become 'ıstanbul' while the text side maps char-wise
    // to 'istanbul', silently missing every I-containing alias; build and
    // match must share one mapping)
    val patterns = patternsIn.map(_.map(Character.toLowerCase))
      .distinct.filter(_.nonEmpty).toArray
    val next = mutable.ArrayBuffer[mutable.Map[Char, Int]](mutable.Map.empty)
    val out = mutable.ArrayBuffer[List[Int]](Nil)

    patterns.zipWithIndex.foreach { case (pat, pi) =>
      var state = 0
      pat.foreach { c =>
        state = next(state).get(c) match {
          case Some(s) => s
          case None =>
            next += mutable.Map.empty
            out += Nil
            val s = next.size - 1
            next(state)(c) = s
            s
        }
      }
      out(state) = pi :: out(state)
    }

    val fail = Array.fill(next.size)(0)
    val queue = mutable.Queue[Int]()
    next(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      next(r).foreach { case (c, u) =>
        queue.enqueue(u)
        var v = fail(r)
        while (v != 0 && !next(v).contains(c)) v = fail(v)
        fail(u) = if (next(v).contains(c) && next(v)(c) != u) next(v)(c) else 0
        out(u) = out(u) ++ out(fail(u))
      }
    }

    // flatten to CSR (edges sorted by char for the binary-search walk)
    val nStates = next.size
    val stateOffsets = new Array[Int](nStates + 1)
    var total = 0
    var s = 0
    while (s < nStates) { stateOffsets(s) = total; total += next(s).size; s += 1 }
    stateOffsets(nStates) = total
    val edgeChars = new Array[Char](total)
    val edgeTargets = new Array[Int](total)
    s = 0
    while (s < nStates) {
      var i = stateOffsets(s)
      next(s).toArray.sortBy(_._1).foreach { case (c, t) =>
        edgeChars(i) = c; edgeTargets(i) = t; i += 1
      }
      s += 1
    }
    val outOffsets = new Array[Int](nStates + 1)
    var ot = 0
    s = 0
    while (s < nStates) { outOffsets(s) = ot; ot += out(s).size; s += 1 }
    outOffsets(nStates) = ot
    val outFlat = new Array[Int](ot)
    s = 0
    while (s < nStates) {
      var i = outOffsets(s)
      out(s).foreach { p => outFlat(i) = p; i += 1 }
      s += 1
    }
    new Gazetteer(edgeChars, edgeTargets, stateOffsets, fail, outFlat, outOffsets,
      patterns, dense)
  }

  /** Standard gazetteer over all KB alias norms. */
  def fromKb(): Gazetteer = build(KB.labelRows.map(_.aliasNorm))

  /** Language-aware gazetteer: detection patterns come from the configured
   * language's LOCAL alias index (reference LANGUAGE=de detects German
   * surfaces; translation happens later at link time, KB.labelsForLang). */
  def fromKb(lang: String): Gazetteer =
    build(KB.labelRowsLocal(lang).map(_.aliasNorm))
}
