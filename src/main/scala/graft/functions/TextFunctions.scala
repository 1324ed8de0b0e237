package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for document fingerprinting/dedup
  * primitives over token arrays (`array<string>`).
  *
  * These are per-row scalar kernels whose cost is dominated by xxhash64
  * over the tokens; they use `CodegenFallback` (one virtual call per
  * row) because the inner loops are already tight JVM code on unsafe
  * UTF8String bytes — the things worth codegen'ing (the loops) live
  * inside `eval`. The dedup pipelines built on top stay fully
  * declarative, so Catalyst still prunes/pushes around them.
  */
object TextFunctions {

  private def isStringArray(t: DataType): Boolean = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  /** CROSS-ENGINE-REPLAYABLE 64-bit token hash (round 7): Java
    * `String.hashCode` (a 31-polynomial over UTF-16 units with 32-bit
    * wrap — a per-character BIGINT fold in DuckDB, since 31·h+c never
    * leaves 2³⁷), sign-extended, then a murmur3-style finalizer
    * RESTATED for portability: Java `>>` == DuckDB `>>` (both
    * arithmetic on signed 64-bit), XOR matches, and the two multiplies
    * wrap mod 2⁶⁴ (free in Java, HUGEINT `% 2^64` in DuckDB). The
    * non-portable ops — Java `>>>` (DuckDB sign-extends) and DuckDB
    * `<<` (errors on overflow) — appear NOWHERE, which is the entire
    * point: it makes [[SimHash64]] and [[RollingHashMin]] exactly
    * replayable by a DuckDB oracle. Avalanche stays murmur-grade (the
    * finalizer's xorshift feedback works the same under arithmetic
    * shift; planted-near-dup recall specs re-validated in round 7).
    * Parity holds for ASCII tokens (code point == UTF-16 unit), which
    * the `[a-z0-9]+` tokenizer guarantees. */
  private[graft] def portableTokenHash(t: UTF8String): Long =
    mix64(t.toString.hashCode.toLong)

  private[graft] def mix64(x0: Long): Long = {
    var x = x0
    x ^= (x >> 33)
    x *= 0xff51afd7ed558ccdL
    x ^= (x >> 29)
    x *= 0xc4ceb9fe1a85ec53L
    x ^= (x >> 32)
    x
  }

  /** Odd multiplier of the rolling window chain (Knuth's MMIX LCG
    * constant — the same one the seeded-shuffle oracle already probed
    * bit-identical through DuckDB HUGEINT `% 2^64`). */
  private[graft] val ChainMult = 6364136223846793005L

  /** 64-bit SimHash over a token array: per-token
    * [[portableTokenHash]]; each of the 64 bit positions accumulates
    * +1/-1 (duplicates counted — SimHash weighs by frequency); the
    * strict-positive sign vector packs into a long. Near-duplicate
    * docs land within a small Hamming distance. The token hash is the
    * cross-engine-replayable one, so the whole signature is DuckDB-
    * oracle-checkable (text_fingerprint's oracle replays it bit-for-
    * bit); empty input → 0L. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      if (isStringArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("simhash64 needs array<string>")

    override def nullSafeEval(a: Any): Any = {
      val toks = a.asInstanceOf[ArrayData]
      val counts = new Array[Int](64)
      var i = 0
      while (i < toks.numElements()) {
        val h = portableTokenHash(toks.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
      sig
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** MinHash signature: `numHashes` permutations h_i(t) = xxhash64(t,
    * seed=i); signature(i) = min over elements. Emits array<long>.
    * Accepts `array<string>` tokens or pre-hashed `array<long>`
    * features (the scale path: hash features once, minhash the longs —
    * re-hashing a long is ~10× cheaper than re-hashing UTF-8 bytes per
    * permutation). */
  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private def isLongArray(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if ((isStringArray(child.dataType) || isLongArray(child.dataType)) && numHashes >= 1)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "minhash needs array<string> or array<long>, numHashes>=1")

    private lazy val fromLongs = isLongArray(child.dataType)

    override def nullSafeEval(a: Any): Any = {
      val toks = a.asInstanceOf[ArrayData]
      val sig = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < toks.numElements()) {
        if (fromLongs) {
          val t = toks.getLong(i)
          var p = 0
          while (p < numHashes) {
            val h = XXH64.hashLong(t, p.toLong)
            if (h < sig(p)) sig(p) = h
            p += 1
          }
        } else {
          val t = toks.getUTF8String(i)
          var p = 0
          while (p < numHashes) {
            val h = XXH64.hashUTF8String(t, p.toLong)
            if (h < sig(p)) sig(p) = h
            p += 1
          }
        }
        i += 1
      }
      new GenericArrayData(sig)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Winnowing-style rolling-hash fingerprint: every `window`-token
    * shingle hashed by the mod-2⁶⁴ polynomial chain h ← h·ChainMult +
    * tokenHash (a Rabin-Karp in [[ChainMult]] over
    * [[portableTokenHash]] values), min over windows in SIGNED 64-bit
    * order — both the chain and the comparison replay exactly in
    * DuckDB (HUGEINT wrap + signed BIGINT min), which is what upgraded
    * text_fingerprint from rows-only to hash-green. Stable under
    * content shifts — two docs sharing any `window`-gram can collide,
    * and near-dups collide with high probability. Empty input → 0L. */
  case class RollingHashMin(child: Expression, window: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      if (isStringArray(child.dataType) && window >= 1)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("rolling_hash needs array<string>, window>=1")

    override def nullSafeEval(a: Any): Any = {
      val toks = a.asInstanceOf[ArrayData]
      val n = toks.numElements()
      if (n == 0) return 0L
      val tokHash = new Array[Long](n)
      var i = 0
      while (i < n) { tokHash(i) = portableTokenHash(toks.getUTF8String(i)); i += 1 }
      val w = math.min(window, n)
      var minH = Long.MaxValue
      var s = 0
      while (s + w <= n) {
        var h = 0L
        var j = 0
        while (j < w) { h = h * ChainMult + tokHash(s + j); j += 1 }
        if (h < minH) minH = h
        s += 1
      }
      minH
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Hashed `n`-token shingles: token-wise xxhash64 once, then each
    * n-window chained via hashLong — the 64-bit identity of the word
    * n-gram. Returns the DISTINCT window hashes (a set, ready for
    * MinHash / Jaccard). One tight loop per row; the SQL-lambda
    * equivalent (transform + slice + concat_ws) runs interpreted and
    * is ~50× slower per gram. Docs shorter than `n` yield the single
    * hash of the whole token sequence. */
  case class ShingleHashes(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      if (isStringArray(child.dataType) && n >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("shingle_hashes needs array<string>, n>=1")

    override def nullSafeEval(a: Any): Any = {
      val toks = a.asInstanceOf[ArrayData]
      val len = toks.numElements()
      val tokHash = prehashTokens(toks)
      val w = math.min(n, math.max(len, 1))
      val out = new java.util.HashSet[java.lang.Long]()
      if (len == 0) out.add(0L)
      else {
        var s = 0
        while (s + w <= len) {
          out.add(windowHash(tokHash, s, w))
          s += 1
        }
      }
      val arr = new Array[Long](out.size)
      val it = out.iterator()
      var k = 0
      while (it.hasNext) { arr(k) = it.next(); k += 1 }
      java.util.Arrays.sort(arr)
      new GenericArrayData(arr)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** The ONE shingle-kernel prehash: token-wise xxhash64 with seed 11.
    * Shared by the set and positional variants — their values MUST stay
    * bit-identical (specs assert set(positional) == set variant). Null
    * elements (legal in SQL array literals; the tokenizer never emits
    * them) hash to the bare seed, mirroring builtin xxhash64(NULL),
    * instead of an executor NPE. */
  private def prehashTokens(toks: ArrayData): Array[Long] = {
    val len = toks.numElements()
    val out = new Array[Long](len)
    var i = 0
    while (i < len) {
      out(i) = if (toks.isNullAt(i)) 11L
        else XXH64.hashUTF8String(toks.getUTF8String(i), 11L)
      i += 1
    }
    out
  }

  /** Chained window hash over prehashed tokens [s, s+w). */
  private def windowHash(tokHash: Array[Long], s: Int, w: Int): Long = {
    var h = 0L
    var j = 0
    while (j < w) { h = XXH64.hashLong(tokHash(s + j), h); j += 1 }
    h
  }

  /** HASHED BIGRAM feature buckets — the DSIR feature space (Xie et
    * al. 2023, data selection with importance resampling: documents
    * are represented as counts of hashed n-gram features in a fixed
    * number of buckets): element i is the bucket of the (token i,
    * token i+1) bigram, duplicates kept IN ORDER (feature COUNTS are
    * the representation — a set would be a different statistic). The
    * hash is the PORTABLE pipeline ([[portableTokenHash]] per token,
    * the [[ChainMult]] mod-2⁶⁴ polynomial for the pair, floorMod into
    * the bucket range) — every op DuckDB replays exactly, so the whole
    * importance-weight computation downstream is oracle-checkable,
    * unlike the xxhash shingle kernel. Docs with < 2 tokens emit an
    * empty array (no bigram features — weight 0 by convention). */
  case class BigramBuckets(child: Expression, nBuckets: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      if (isStringArray(child.dataType) && nBuckets >= 1)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "bigram_buckets needs array<string>, nBuckets>=1")

    override def nullSafeEval(a: Any): Any = {
      val toks = a.asInstanceOf[ArrayData]
      val len = toks.numElements()
      if (len < 2) return new GenericArrayData(Array.emptyLongArray)
      val th = new Array[Long](len)
      var i = 0
      while (i < len) {
        th(i) = if (toks.isNullAt(i)) 0L
          else portableTokenHash(toks.getUTF8String(i))
        i += 1
      }
      val out = new Array[Long](len - 1)
      i = 0
      while (i < len - 1) {
        val f = th(i) * ChainMult + th(i + 1) // wraps mod 2^64
        out(i) = java.lang.Math.floorMod(f, nBuckets.toLong)
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** POSITIONAL `n`-token window hashes: same token-prehash + chained
    * hashLong kernel as [[ShingleHashes]], but IN TEXT ORDER with
    * duplicates kept — element i is the hash of the window starting at
    * token i, so `posexplode` yields true text positions. This is the
    * primitive exact-substring dedup needs (runs are position ranges;
    * the distinct SET the MinHash family uses destroys both position
    * and multiplicity). Docs shorter than `n` yield an EMPTY array — a
    * doc with no n-window has no positional grams (unlike the set
    * variant's whole-doc fallback, which answers a different question).
    * One tight primitive loop per row; the SQL-lambda equivalent
    * (transform + aggregate + slice) runs interpreted with boxed longs. */
  case class PositionalShingleHashes(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      if (isStringArray(child.dataType) && n >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("positional_shingle_hashes needs array<string>, n>=1")

    override def nullSafeEval(a: Any): Any = {
      val toks = a.asInstanceOf[ArrayData]
      val len = toks.numElements()
      if (len < n) return new GenericArrayData(Array.emptyLongArray)
      val tokHash = prehashTokens(toks)
      val out = new Array[Long](len - n + 1)
      var s = 0
      while (s + n <= len) {
        out(s) = windowHash(tokHash, s, n)
        s += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Character n-gram language profile score against a fixed profile of
    * distinctive character sequences per language. Returns the argmax
    * language code. A heuristic n-gram language identifier: real
    * deployments would learn profiles from labeled corpora; this uses
    * hand-rolled profiles for {en, de, es, fr, zh}. */
  case class LangIdGuess(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("langid needs string")

    override def nullSafeEval(a: Any): Any = {
      val s = a.asInstanceOf[UTF8String].toString.toLowerCase
      // CJK short-circuit: any Han codepoint → zh.
      if (s.exists(c => Character.UnicodeScript.of(c) == Character.UnicodeScript.HAN))
        return UTF8String.fromString("zh")
      val grams: Map[String, Seq[String]] = Map(
        "en" -> Seq(" the ", " and ", " of ", " is ", "ing ", " to "),
        "de" -> Seq(" der ", " die ", " und ", " ist ", "sch", " das "),
        "es" -> Seq(" el ", " que ", " los ", " una ", "ción", " por "),
        "fr" -> Seq(" les ", " des ", " est ", " une ", " avec ", " pour "))
      val padded = " " + s + " "
      var best = "en" // zero-signal default; only a positive score replaces it
      var bestScore = 0
      for ((lang, gs) <- grams.toSeq.sortBy(_._1)) {
        var score = 0
        for (g <- gs) {
          var idx = padded.indexOf(g)
          while (idx >= 0) { score += 1; idx = padded.indexOf(g, idx + 1) }
        }
        if (score > bestScore) { bestScore = score; best = lang }
      }
      UTF8String.fromString(best)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** DEFLATE compression ratio of a string's UTF-8 bytes — the
    * Gopher-family quality signal: highly repetitive machine text
    * compresses far below natural prose, random noise barely at all,
    * so the ratio separates boilerplate/spam from language at one
    * sequential pass per row, no tokenization, no corpus state.
    * Fixed level 6 + nowrap keeps the output a pure function of the
    * bytes within a JDK (zlib heuristics can differ ACROSS JDK
    * implementations — why this is a spec-checked signal, not an
    * oracle query). Empty input → ratio 1.0 (incompressible by
    * convention, avoids 0/0). */
  case class DeflateRatio(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"deflate_ratio needs a string, got ${child.dataType.sql}")

    override def nullSafeEval(a: Any): Any = {
      val bytes = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      if (bytes.isEmpty) 1.0
      else {
        // one native zlib handle per task thread, reset between rows —
        // per-row Deflater allocation costs a JNI init + finalizer
        // pressure on every document in the corpus
        val d = DeflateRatio.local.get()
        d.reset()
        d.setInput(bytes); d.finish()
        val buf = DeflateRatio.buf.get()
        var out = 0L
        while (!d.finished()) out += d.deflate(buf)
        out.toDouble / bytes.length
      }
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "deflate_ratio"
  }

  object DeflateRatio {
    private[TextFunctions] val local =
      ThreadLocal.withInitial[java.util.zip.Deflater](() =>
        new java.util.zip.Deflater(6, true))
    private[TextFunctions] val buf =
      ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](8192))
  }

  /** Per-document term-frequency map: `array<string>` tokens →
    * `map<string,bigint>` of term → count, in one hash-map pass per
    * row. This is the SHUFFLE-FREE form of `groupBy(doc_id, term)
    * .count()`: the grouping key (the document) is the row itself, so
    * the whole per-doc aggregation is row-local — `explode(map)` then
    * yields the (term, tf) pairs with ZERO exchange, where the
    * groupBy form ships every distinct (doc, term) through a hash
    * partitioning. At 100 TB that exchange is the dominant cost of
    * every inverted-index query (TF-IDF, LM scoring); this kernel
    * deletes it. Keys keep first-appearance order (deterministic
    * plans; consumers that need an order still sort explicitly).
    * Empty array → empty map (explode then drops the doc, matching
    * the groupBy shape, which never saw a row). */
  case class TokenCounts(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      MapType(StringType, LongType, valueContainsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      if (isStringArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("token_counts needs array<string>")

    override def nullSafeEval(a: Any): Any = {
      val toks = a.asInstanceOf[ArrayData]
      val n = toks.numElements()
      val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long](
        math.max(8, n / 2))
      var i = 0
      while (i < n) {
        // clone: parquet-scan UTF8Strings point into a reused column
        // batch buffer; the map outlives the row in the explode above
        val t = toks.getUTF8String(i).clone()
        val prev = counts.get(t)
        counts.put(t, if (prev == null) 1L else prev + 1L)
        i += 1
      }
      val keys = new Array[Any](counts.size)
      val vals = new Array[Any](counts.size)
      var j = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        keys(j) = e.getKey; vals(j) = e.getValue; j += 1
      }
      new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        new GenericArrayData(keys), new GenericArrayData(vals))
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "token_counts"
  }

  /** TEXT NORMALIZATION — pipeline stage zero, the pass every dedup,
    * hash, and tokenizer stage silently assumes has already run: the
    * same document crawled twice can arrive NFD vs NFC ("café" as
    * e+◌́ vs é), cased differently, or with whitespace mangled by an
    * extractor — and every byte-level fingerprint in this repo would
    * call them different. NFC-compose (java.text.Normalizer — ICU
    * semantics for the composed forms), locale-independent lowercase
    * (Locale.ROOT — a tr_TR default locale must not change corpus
    * hashes), collapse [ \t\n\r\f] runs to one space, trim. Empty
    * stays empty; null stays null (UnaryExpression's contract). */
  case class NormalizeText(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"normalize_text needs a string, got ${child.dataType.sql}")

    override def nullSafeEval(a: Any): Any = {
      val s = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .toString
      val nfc =
        if (java.text.Normalizer.isNormalized(s,
            java.text.Normalizer.Form.NFC)) s // the common fast path
        else java.text.Normalizer.normalize(s,
          java.text.Normalizer.Form.NFC)
      org.apache.spark.unsafe.types.UTF8String.fromString(
        nfc.toLowerCase(java.util.Locale.ROOT)
          .replaceAll("[ \\t\\n\\r\\f]+", " ").trim)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  // Column-API wrappers.
  def normalizeText(text: Column): Column =
    GraftColumn.apply(NormalizeText(GraftColumn.expression(text)))

  def simhash64(tokens: Column): Column =
    GraftColumn.apply(SimHash64(GraftColumn.expression(tokens)))

  def minhash(tokens: Column, numHashes: Int): Column =
    GraftColumn.apply(MinHashSignature(GraftColumn.expression(tokens), numHashes))

  def rollingHashMin(tokens: Column, window: Int): Column =
    GraftColumn.apply(RollingHashMin(GraftColumn.expression(tokens), window))

  def langId(text: Column): Column =
    GraftColumn.apply(LangIdGuess(GraftColumn.expression(text)))

  def bigramBuckets(tokens: Column, nBuckets: Int): Column =
    GraftColumn.apply(BigramBuckets(GraftColumn.expression(tokens), nBuckets))

  def shingleHashes(tokens: Column, n: Int): Column =
    GraftColumn.apply(ShingleHashes(GraftColumn.expression(tokens), n))

  def positionalShingleHashes(tokens: Column, n: Int): Column =
    GraftColumn.apply(PositionalShingleHashes(GraftColumn.expression(tokens), n))

  def deflateRatio(text: Column): Column =
    GraftColumn.apply(DeflateRatio(GraftColumn.expression(text)))

  def tokenCounts(tokens: Column): Column =
    GraftColumn.apply(TokenCounts(GraftColumn.expression(tokens)))
}
