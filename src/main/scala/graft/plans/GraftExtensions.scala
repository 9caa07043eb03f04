package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the graft sketch
  * expressions as SQL functions, so `spark.sql` users (and external
  * SQL tooling) get the same compiled hot paths as the DataFrame API.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * Registered:
  *  - `array_scan(xs, zero, (acc, x) -> step) -> array` (prefix fold)
  *  - `cosine_sim(array<float|double>, array<float|double>) -> double`
  *  - `jaccard_text(string, string, k, word) -> double`
  *  - `containment_text(string, string, k, word) -> double`
  *  - `shingle_hashes(string, k, word) -> array<bigint>`
  *  - `minhash_text(string, k, numPerm, word) -> array<bigint>`
  *  - `simhash64(array<string>) -> bigint`
  *  - `quantize_i8(array<float|double>) -> array<tinyint>`
  *  - `xml_leaf_map(string) -> map<string,string>`
  *  - `word_ngrams(string, n) -> array<string>`
  *  - `repetition_stats(string) -> struct<n_words,n_distinct_words,top_bigram_count>`
  *  - `remove_spans(string, array<bigint>, n) -> struct<kept_text,n_tokens,n_removed>`
  *  - `bpe_encode(string, array<string>) -> struct<encoded,n_tokens>`
  *  - `kendall_stats(array<bigint>) -> struct<cd,ties>` (O(m log m))
  *  - `heavy_hitters(string, k) -> array<struct<item,cnt>>` (aggregate)
  *  - `top_k_by(ord, payload, k) -> array<struct<payload,ord>>` (aggregate)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def boolArg(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }

  /** Ordered merge list from a SQL literal array of "left right"
    * strings (symbols never contain spaces — they are concatenations
    * of word characters), accepting both the folded Literal form and
    * the unfolded `array('t a', ...)` CreateArray form.
    */
  private def mergesArg(e: Expression, what: String): Seq[(String, String)] = {
    val strings: Seq[String] = e match {
      case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData,
                   org.apache.spark.sql.types.ArrayType(
                     org.apache.spark.sql.types.StringType, _)) =>
        v.toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
          .toSeq
      case arr: org.apache.spark.sql.catalyst.expressions.CreateArray =>
        arr.children.map {
          case Literal(u: org.apache.spark.unsafe.types.UTF8String, _) => u.toString
          case other => throw new IllegalArgumentException(
            s"$what elements must be string literals, got $other")
        }
      case other => throw new IllegalArgumentException(
        s"$what must be an array<string> literal of 'left right' pairs, got $other")
    }
    strings.map { s =>
      val sp = s.indexOf(' ')
      if (sp <= 0 || sp != s.lastIndexOf(' ') || sp == s.length - 1)
        throw new IllegalArgumentException(
          s"$what: each merge must be 'left right' with exactly one space, got '$s'")
      (s.substring(0, sp), s.substring(sp + 1))
    }
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.plans.HashExprs", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two numeric arrays"),
      (args: Seq[Expression]) => CosineSimExpr(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("array_scan"),
      info("array_scan",
        "array_scan(xs, zero, (acc, x) -> step) - the prefix-fold trajectory " +
          "[zero, s1..sm]: like aggregate but emitting every intermediate state " +
          "in O(m) (the aggregate+concat idiom is O(m^2))"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"array_scan(xs, zero, (acc, x) -> step) takes 3 arguments, got ${args.length}")
        org.apache.spark.sql.GraftArrayScan(args(0), args(1), args(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("jaccard_text"),
      info("jaccard_text", "jaccard_text(a, b, k, word) - shingle-set Jaccard of two normalized texts"),
      (args: Seq[Expression]) => JaccardTextExpr(args(0), args(1),
        intArg(args(2), "k"), boolArg(args(3), "word"))))
    ext.injectFunction((
      FunctionIdentifier("containment_text"),
      info("containment_text", "containment_text(a, b, k, word) - shingle-set containment |A∩B|/min(|A|,|B|) of two normalized texts"),
      (args: Seq[Expression]) => ContainmentTextExpr(args(0), args(1),
        intArg(args(2), "k"), boolArg(args(3), "word"))))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(text, k, word) - sorted distinct 64-bit shingle hashes of a normalized text"),
      (args: Seq[Expression]) => ShingleHashesExpr(args(0),
        intArg(args(1), "k"), boolArg(args(2), "word"))))
    ext.injectFunction((
      FunctionIdentifier("minhash_text"),
      info("minhash_text", "minhash_text(text, k, numPerm, word) - MinHash signature of a normalized text"),
      (args: Seq[Expression]) => MinHashTextExpr(args(0),
        intArg(args(1), "k"), intArg(args(2), "numPerm"), boolArg(args(3), "word"))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash64Expr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("quantize_i8"),
      info("quantize_i8", "quantize_i8(v) - symmetric int8 quantization of a numeric array"),
      (args: Seq[Expression]) => QuantizeI8Expr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("xml_leaf_map"),
      info("xml_leaf_map", "xml_leaf_map(payload) - XML leaf elements + attributes as map<string,string>, lowercased keys"),
      (args: Seq[Expression]) => XmlLeafMapExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(text, n) - word n-grams of a single-space-normalized text"),
      (args: Seq[Expression]) => WordNgramsExpr(args(0), intArg(args(1), "n"))))
    ext.injectFunction((
      FunctionIdentifier("repetition_stats"),
      info("repetition_stats", "repetition_stats(text) - struct(n_words, n_distinct_words, top_bigram_count) of a single-space-normalized text"),
      (args: Seq[Expression]) => RepetitionStatsExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("remove_spans"),
      info("remove_spans", "remove_spans(text, starts, n) - drop tokens covered by n-token spans at the sorted start indices"),
      (args: Seq[Expression]) => RemoveSpansExpr(args(0), args(1), intArg(args(2), "n"))))
    ext.injectFunction((
      FunctionIdentifier("bpe_encode"),
      info("bpe_encode", "bpe_encode(text, merges) - BPE-encode a normalized text with an ordered array of 'left right' merges"),
      (args: Seq[Expression]) => BpeEncodeExpr(args(0), mergesArg(args(1), "merges"))))
    ext.injectFunction((
      FunctionIdentifier("kendall_stats"),
      info("kendall_stats",
        "kendall_stats(xs) - struct(cd, ties) of an array<bigint> against its " +
          "index order: cd = sum of sign(x_j - x_i) over i < j, ties = equal " +
          "pairs; O(m log m) rank-compression + Fenwick pass"),
      (args: Seq[Expression]) => KendallStatsExpr(args(0))))
    // aggregate function: the analyzer wraps a bare AggregateFunction
    // into its AggregateExpression, same as the builtin registry
    ext.injectFunction((
      FunctionIdentifier("heavy_hitters"),
      info("heavy_hitters", "heavy_hitters(key, k) - bounded-memory Misra-Gries heavy-hitter summary as array<struct<item, cnt>>"),
      (args: Seq[Expression]) => MisraGries(args(0), intArg(args(1), "k"))))
    ext.injectFunction((
      FunctionIdentifier("top_k_by"),
      info("top_k_by", "top_k_by(ord, payload, k) - exact bounded-heap top-k: array<struct<payload, ord>> of the k highest-ord rows, ties to the smaller payload"),
      (args: Seq[Expression]) => TopKByOrd(args(0), args(1), intArg(args(2), "k"))))
  }
}
