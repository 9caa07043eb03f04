package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.plans._

/** Property tests for the custom expression layer: each compiled
  * expression is checked against an INDEPENDENT naive Scala
  * implementation on randomized normalized texts/vectors — hundreds of
  * inputs per property, directly through the interpreted `eval` path
  * (the codegen path is asserted equal to interpreted separately, in
  * HashExprsSpec's whole-stage-codegen test, so these properties cover
  * both). Texts are generated pre-normalized (lowercase words joined
  * by single spaces) because every text expression documents that
  * contract.
  */
object HashExprsProps extends Properties("HashExprs") {

  private val word: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  private val text: Gen[String] = for {
    n <- Gen.choose(0, 40)
    ws <- Gen.listOfN(n, word)
  } yield ws.mkString(" ")

  private val nonEmptyText: Gen[String] = text.suchThat(_.nonEmpty)

  private def str(s: String): Literal = Literal.create(s, StringType)

  // independent shingle-set definition (mirrors the documented
  // contract: texts shorter than one shingle are one whole-text shingle)
  private def shingles(s: String, k: Int, word: Boolean): Set[String] =
    if (word) {
      val w = s.split(" ", -1)
      if (w.length <= k) Set(s) else w.sliding(k).map(_.mkString(" ")).toSet
    } else {
      if (s.length <= k) Set(s) else s.sliding(k).toSet
    }

  private def naiveJaccard(a: String, b: String, k: Int, word: Boolean): Double = {
    val (sa, sb) = (shingles(a, k, word), shingles(b, k, word))
    val union = (sa ++ sb).size
    if (union == 0) 1.0 else (sa & sb).size.toDouble / union
  }

  private def naiveContainment(a: String, b: String, k: Int, word: Boolean): Double = {
    val (sa, sb) = (shingles(a, k, word), shingles(b, k, word))
    val m = math.min(sa.size, sb.size)
    if (m == 0) 1.0 else (sa & sb).size.toDouble / m
  }

  property("jaccard_text equals naive set Jaccard (char and word shingles)") =
    forAll(text, text, Gen.choose(2, 6), Gen.oneOf(true, false)) { (a, b, k, w) =>
      val got = JaccardTextExpr(str(a), str(b), k, w).eval(InternalRow.empty)
        .asInstanceOf[Double]
      math.abs(got - naiveJaccard(a, b, k, w)) < 1e-12
    }

  property("containment_text equals naive set containment and dominates Jaccard") =
    forAll(text, text, Gen.choose(2, 6), Gen.oneOf(true, false)) { (a, b, k, w) =>
      val c = ContainmentTextExpr(str(a), str(b), k, w).eval(InternalRow.empty)
        .asInstanceOf[Double]
      val j = JaccardTextExpr(str(a), str(b), k, w).eval(InternalRow.empty)
        .asInstanceOf[Double]
      math.abs(c - naiveContainment(a, b, k, w)) < 1e-12 &&
        c >= j - 1e-12 && c >= 0.0 && c <= 1.0
    }

  property("shingle_hashes cardinality equals the naive distinct shingle count") =
    forAll(text, Gen.choose(2, 6), Gen.oneOf(true, false)) { (s, k, w) =>
      val arr = ShingleHashesExpr(str(s), k, w).eval(InternalRow.empty)
        .asInstanceOf[ArrayData]
      arr.numElements() == shingles(s, k, w).size
    }

  property("word_ngrams equals naive sliding windows") =
    forAll(nonEmptyText, Gen.choose(1, 5)) { (s, n) =>
      val got = WordNgramsExpr(str(s), n).eval(InternalRow.empty)
        .asInstanceOf[ArrayData].toObjectArray(StringType).map(_.toString).toSeq
      val w = s.split(" ", -1).toSeq
      val want = if (w.length < n) Seq.empty else w.sliding(n).map(_.mkString(" ")).toSeq
      got == want
    }

  property("stopword_hits equals naive vocabulary count") =
    forAll(text, Gen.listOfN(3, word)) { (s, vocab) =>
      val got = StopwordHitsExpr(str(s), vocab).eval(InternalRow.empty)
        .asInstanceOf[Int]
      val want = s.split("\\s+").count(t => t.nonEmpty && vocab.contains(t))
      got == want
    }

  property("repetition_stats equals naive word/distinct/bigram counts") =
    forAll(nonEmptyText) { s =>
      val row = RepetitionStatsExpr(str(s)).eval(InternalRow.empty)
        .asInstanceOf[InternalRow]
      val w = s.split(" ", -1).toSeq
      val bigrams = if (w.length < 2) Seq.empty
        else w.sliding(2).map(_.mkString(" ")).toSeq
      val top = if (bigrams.isEmpty) 0L
        else bigrams.groupBy(identity).values.map(_.size).max.toLong
      row.getLong(0) == w.length.toLong &&
        row.getLong(1) == w.distinct.length.toLong &&
        row.getLong(2) == top
    }

  property("remove_spans equals naive covered-token filtering") = {
    val gen = for {
      s <- nonEmptyText
      n <- Gen.choose(1, 4)
      m <- Gen.choose(0, 5)
      ss <- Gen.listOfN(m, Gen.choose(0L, 45L))
    } yield (s, n, ss.sorted)
    forAll(gen) { case (s, n, starts) =>
      val row = RemoveSpansExpr(str(s),
        Literal.create(starts, ArrayType(LongType)), n).eval(InternalRow.empty)
        .asInstanceOf[InternalRow]
      val w = s.split(" ", -1).toSeq
      val covered = (i: Int) => starts.exists(st => i >= st && i < st + n)
      val kept = w.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      row.getUTF8String(0).toString == kept.mkString(" ") &&
        row.getLong(1) == w.length.toLong &&
        row.getLong(2) == w.zipWithIndex.count(p => covered(p._2)).toLong
    }
  }

  property("lang_segments token counts sum to the doc token count, runs merged") = {
    val profiles = Seq("aa" -> Seq("the", "of", "and"), "bb" -> Seq("le", "la", "et"))
    forAll(nonEmptyText, Gen.choose(1, 8)) { (s, win) =>
      val arr = LangSegmentsExpr(str(s), win, profiles).eval(InternalRow.empty)
        .asInstanceOf[ArrayData]
      val segs = (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getLong(1))
      }
      val nTokens = s.split(" ", -1).length.toLong
      segs.map(_._2).sum == nTokens &&
        segs.forall(_._2 > 0) &&
        segs.sliding(2).forall(p => p.length < 2 || p(0)._1 != p(1)._1)
    }
  }

  private val vec: Gen[Seq[Double]] = for {
    n <- Gen.choose(0, 16)
    vs <- Gen.listOfN(n, Gen.choose(-10.0, 10.0))
  } yield vs

  private def arr(v: Seq[Double]): Literal =
    Literal.create(v, ArrayType(DoubleType))

  property("quantize_i8 stays in int8 range and reconstructs within scale/2") =
    forAll(vec) { v =>
      val q = QuantizeI8Expr(arr(v)).eval(InternalRow.empty)
        .asInstanceOf[ArrayData].toByteArray()
      val scale = (if (v.isEmpty) 0.0 else v.map(math.abs).max) / 127.0
      q.length == v.length &&
        q.forall(b => b >= -127 && b <= 127) &&
        v.indices.forall { i =>
          if (scale == 0.0) q(i) == 0
          else math.abs(q(i) * scale - v(i)) <= scale / 2 + 1e-12
        }
    }

  property("l2_normalize emits unit (or zero) vectors preserving direction") =
    forAll(vec) { v =>
      val out = L2NormalizeExpr(arr(v)).eval(InternalRow.empty)
        .asInstanceOf[ArrayData].toDoubleArray()
      val norm = math.sqrt(out.map(x => x * x).sum)
      val inNorm = math.sqrt(v.map(x => x * x).sum)
      if (inNorm == 0.0) out.forall(_ == 0.0)
      else math.abs(norm - 1.0) < 1e-9 &&
        v.indices.forall(i => math.abs(out(i) * inNorm - v(i)) < 1e-9)
    }

  property("cosine_sim is symmetric, bounded, and 1.0 on self") =
    forAll(vec.suchThat(v => v.exists(_ != 0.0))) { v =>
      val self = CosineSimExpr(arr(v), arr(v)).eval(InternalRow.empty)
        .asInstanceOf[Double]
      math.abs(self - 1.0) < 1e-9
    } && forAll(vec, vec) { (a, b) =>
      val ab = CosineSimExpr(arr(a), arr(b)).eval(InternalRow.empty)
        .asInstanceOf[Double]
      val ba = CosineSimExpr(arr(b), arr(a)).eval(InternalRow.empty)
        .asInstanceOf[Double]
      ab == ba && ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9
    }

  property("simhash64 is deterministic and order-insensitive over token multisets") =
    forAll(Gen.listOf(word)) { tokens =>
      def sh(ts: Seq[String]): Long = SimHash64Expr(
        Literal.create(ts, ArrayType(StringType))).eval(InternalRow.empty)
        .asInstanceOf[Long]
      sh(tokens) == sh(scala.util.Random.shuffle(tokens))
    }

  property("minhash lanes are deterministic and superset-dominated") =
    forAll(nonEmptyText, nonEmptyText) { (a, b) =>
      def sig(s: String): Array[Long] = MinHashTextExpr(str(s), 1, 16, true)
        .eval(InternalRow.empty).asInstanceOf[ArrayData].toLongArray()
      // word 1-shingles: shingles(a + " " + b) == shingles(a) ∪ shingles(b),
      // so every lane minimum of the union is <= each side's minimum
      val (sa, sb, su) = (sig(a), sig(b), sig(a + " " + b))
      su.indices.forall(i => su(i) <= sa(i) && su(i) <= sb(i)) &&
        sig(a).sameElements(sig(a))
    }

  // independent rank-order BPE: per word, each merge once in order,
  // one left-to-right non-overlapping sweep (the documented contract);
  // symbols are CODEPOINTS, split here via the java.util.stream API —
  // a different mechanism than the expression's charCount loop, so
  // the two implementations stay independent witnesses
  private def naiveBpe(text: String, merges: Seq[(String, String)]): Seq[String] =
    text.split(" ", -1).filter(_.nonEmpty).toSeq.flatMap { w =>
      var syms = w.codePoints().toArray.toList
        .map(cp => new String(Character.toChars(cp)))
      merges.foreach { case (l, r) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var rest = syms
        while (rest.nonEmpty) rest match {
          case a :: b :: tail if a == l && b == r => out += (l + r); rest = tail
          case a :: tail => out += a; rest = tail
          case Nil => ()
        }
        syms = out.toList
      }
      syms
    }

  // BPE-specific text: words mixing ASCII letters with ASTRAL chars
  // (2 UTF-16 units each), so the property fails if either side ever
  // splits symbols on code units instead of codepoints. Kept separate
  // from the shared `word` gen — the char-shingle naive references
  // above intentionally count code units.
  private val bpeText: Gen[String] = {
    val sym = Gen.frequency(
      9 -> Gen.alphaLowerChar.map(String.valueOf(_)),
      1 -> Gen.oneOf("😀", "𝕏"))
    val w = for {
      n <- Gen.choose(1, 8)
      cs <- Gen.listOfN(n, sym)
    } yield cs.mkString
    for {
      n <- Gen.choose(0, 40)
      ws <- Gen.listOfN(n, w)
    } yield ws.mkString(" ")
  }

  private val mergeList: Gen[Seq[(String, String)]] = for {
    n <- Gen.choose(0, 6)
    ms <- Gen.listOfN(n, for {
      l <- Gen.choose(1, 2).flatMap(k =>
        Gen.listOfN(k, Gen.alphaLowerChar).map(_.mkString))
      r <- Gen.alphaLowerChar.map(String.valueOf(_))
    } yield (l, r))
  } yield ms

  property("bpe_encode equals the naive rank-order sweep, token-count consistent") =
    forAll(bpeText, mergeList) { (t, merges) =>
      val row = BpeEncodeExpr(str(t), merges).eval(InternalRow.empty)
        .asInstanceOf[InternalRow]
      val expected = naiveBpe(t, merges)
      row.getUTF8String(0).toString == expected.mkString(" ") &&
        row.getLong(1) == expected.length.toLong
    }

  // The HALF_UP integer identity floor((2·n·10⁴ + d) / (2·d)) is the
  // engine-portable 4dp rounding used by ~30 gate operators (shares,
  // RSI, VWAP, latency averages). It must equal BigDecimal HALF_UP of
  // n/d at scale 4 for every non-negative n and positive d — including
  // exact .00005 halves, where double round() is representation-
  // dependent and the identity is the whole point.
  property("half-up bp identity equals BigDecimal HALF_UP for non-negative ratios") =
    forAll(Gen.choose(0L, 1000000L), Gen.choose(1L, 1000000L)) { (n, d) =>
      val identity = (2 * n * 10000 + d) / (2 * d)
      val expected = new java.math.BigDecimal(n)
        .multiply(new java.math.BigDecimal(10000))
        .divide(new java.math.BigDecimal(d), 0, java.math.RoundingMode.HALF_UP)
        .longValueExact()
      identity == expected
    }

  // The nearest-rank selector (p·n + 99) div 100 must equal ⌈p·n/100⌉
  // — the percentile convention shared by value_bands, latency_bands,
  // logprob_cutoffs, and the quantile gates.
  property("nearest-rank identity equals ceiling of p·n/100") =
    forAll(Gen.choose(1, 100), Gen.choose(1L, 10000000L)) { (p, n) =>
      (p * n + 99) / 100 == (p * n + 100 - 1) / 100 &&
        (p * n + 99) / 100 == math.ceil(p.toDouble * n / 100.0).toLong
    }

  // The signed-change form (2·c·10⁴ + p) div (2·p) − 10⁴ with both
  // operands positive must equal HALF_UP of (c/p − 1)·10⁴ — the
  // region_mom_growth / top_movers convention, immune to the
  // floor-vs-truncate divergence a negative intermediate would hit.
  property("signed bp change identity equals HALF_UP of the ratio minus one") =
    forAll(Gen.choose(1L, 1000000L), Gen.choose(1L, 1000000L)) { (c, p) =>
      val identity = (2 * c * 10000 + p) / (2 * p) - 10000
      val expected = new java.math.BigDecimal(c)
        .multiply(new java.math.BigDecimal(10000))
        .divide(new java.math.BigDecimal(p), 0, java.math.RoundingMode.HALF_UP)
        .longValueExact() - 10000
      identity == expected
    }

  // The SIGNED half-up identity behind the integer indicator folds
  // (macd/rsi_wilder/keltner and their streaming twins): re-applying
  // the sign around the non-negative identity must equal BigDecimal
  // HALF_UP (away from zero on exact halves) for every signed
  // numerator — including the exact .5 cases where float division
  // is representation-dependent.
  property("signed half-up identity equals BigDecimal HALF_UP for any numerator") =
    forAll(Gen.choose(-2000000L, 2000000L), Gen.choose(1L, 1000L)) { (num, den) =>
      val identity =
        if (num >= 0) (2 * num + den) / (2 * den)
        else -((2 * -num + den) / (2 * den))
      val expected = new java.math.BigDecimal(num)
        .divide(new java.math.BigDecimal(den), 0, java.math.RoundingMode.HALF_UP)
        .longValueExact()
      identity == expected
    }

  // The signed-zero convention (SURVEY §6): the gate hashes BYTES, and
  // IEEE −0.0 and +0.0 are value-equal but byte-distinct. Spark's
  // round() goes through BigDecimal (which has no −0), so every
  // rounded Spark double that lands on zero is +0.0; DuckDB's round()
  // preserves −0.0 for tiny negatives, so every float-emitting oracle
  // appends `+ 0.0` after its final round() (−0.0 + 0.0 = +0.0 under
  // IEEE 754 round-to-nearest). This property pins both halves: the
  // Spark path emits +0.0 bits for every tiny value that rounds to
  // zero, and `+ 0.0` is a bit-exact no-op on every non-zero double
  // while normalizing both zeros to +0.0.
  property("rounded tiny values emit +0.0 bits; + 0.0 normalizes signed zero") = {
    val plusZeroBits = java.lang.Double.doubleToRawLongBits(0.0)
    val tiny: Gen[(Double, Int)] = for {
      scale <- Gen.choose(1, 6)
      // anything with |x| < 0.5·10^-scale rounds to zero at that scale
      mag <- Gen.choose(0.0, 0.49999 * math.pow(10.0, -scale))
      sign <- Gen.oneOf(-1.0, 1.0)
    } yield (sign * mag, scale)
    val sparkRoundIsPositiveZero = forAll(tiny) { case (x, scale) =>
      val rounded = BigDecimal.valueOf(x)
        .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
      java.lang.Double.doubleToRawLongBits(rounded) == plusZeroBits
    }
    val plusZeroNormalizes = forAll(
      Gen.oneOf(Gen.const(-0.0), Gen.const(0.0),
        Gen.choose(-1e9, 1e9).suchThat(v => !v.isNaN))) { v =>
      val n = v + 0.0
      if (v == 0.0) java.lang.Double.doubleToRawLongBits(n) == plusZeroBits
      else java.lang.Double.doubleToRawLongBits(n) ==
        java.lang.Double.doubleToRawLongBits(v)
    }
    sparkRoundIsPositiveZero && plusZeroNormalizes
  }

  property("kendall_stats equals the naive O(m^2) pair scan") =
    forAll(Gen.choose(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-50L, 50L)))) { xs =>
      val arr = Literal.create(xs.toArray, ArrayType(LongType, containsNull = false))
      val row = KendallStatsExpr(arr).eval(InternalRow.empty)
        .asInstanceOf[InternalRow]
      var cd = 0L; var ties = 0L
      for (i <- xs.indices; j <- (i + 1) until xs.length) {
        cd += java.lang.Long.signum(xs(j) - xs(i))
        if (xs(i) == xs(j)) ties += 1
      }
      row.getLong(0) == cd && row.getLong(1) == ties
    }
}
