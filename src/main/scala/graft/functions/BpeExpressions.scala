package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding codec: APPLY a learned merge-rank table to
  * produce real token ids (and decode them back) — the encoder a
  * pretraining pipeline runs over every document, distinct from the
  * merge-candidate STATISTIC `text_bpe_pairs` computes.
  *
  * Granularity: Unicode CODE POINTS at the base level (never UTF-16
  * units — a lone surrogate half is not valid UTF-8, so it could not
  * ride a vocab literal through Catalyst; whole code points keep
  * astral chars (emoji, CJK-ext) in-vocab and encode∘decode the
  * identity whenever the vocab covers the corpus alphabet — a
  * byte-level production tokenizer would start from bytes instead;
  * the merge algebra is identical). Merge loop: repeatedly merge the
  * LOWEST-RANK adjacent
  * pair present, all its occurrences left to right — the canonical BPE
  * encode order, deterministic for any input. Rounds are bounded by
  * the token count (each merge shortens the sequence), so a doc of n
  * chars costs O(n · merges-applied) — linear in practice for the
  * bounded merge tables a sampled training produces.
  *
  * The codec object serializes WITH the expression (task-closure
  * broadcast of the bounded merge table); per row only the text is
  * evaluated — the table is parsed once per executor. */
final class BpeCodec(val merges: Array[String], val vocab: Array[String])
    extends Serializable {

  @transient private lazy val ids: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.length * 2)
    vocab.zipWithIndex.foreach { case (t, i) => m.putIfAbsent(t, i) }
    m
  }

  /** Token id, or -1 for an out-of-vocab token (decodes to U+FFFD). */
  private def idOf(t: String): Int = {
    val v = ids.get(t)
    if (v == null) -1 else v.intValue
  }

  /** The encode hot path works entirely on INT vocab ids: single-char
    * lookups through a flat ASCII table (char map above 0x7f), and the
    * (left, right) -> (rank, merged-id) lookup through an
    * open-addressed long-keyed probe — ZERO allocation per adjacent
    * pair, which is what matters for the once-per-pair-per-round inner
    * loop of a corpus-sized encode. A merge any of whose components
    * (side or output) lacks a vocab id never fires — with the standard
    * vocab construction (corpus alphabet plus merge outputs) every
    * component has an id, so semantics match the string form exactly. */
  @transient private lazy val tables: BpeCodec.Tables = {
    merges.foreach { p =>
      val sp = p.indexOf(' ')
      require(sp > 0 && sp < p.length - 1, s"malformed merge '$p'")
    }
    BpeCodec.Tables.build(merges, vocab, idOf)
  }

  def encode(text: UTF8String): ArrayData = {
    val s = text.toString
    val t = tables
    val buf = new Array[Int](s.length)
    var n = 0
    var i = 0
    while (i < s.length) { // per CODE POINT (surrogate pairs whole)
      val cp = s.codePointAt(i)
      buf(n) = t.cpId(cp); n += 1; i += Character.charCount(cp)
    }
    var done = n <= 1
    while (!done) {
      // lowest-rank adjacent pair present this round
      var best = Int.MaxValue
      var bestSlot = -1
      var j = 0
      while (j < n - 1) {
        val slot = t.findPair(buf(j), buf(j + 1))
        if (slot >= 0 && t.rankAt(slot) < best) {
          best = t.rankAt(slot); bestSlot = slot
        }
        j += 1
      }
      if (bestSlot < 0) done = true
      else {
        val l = t.leftAt(bestSlot)
        val r = t.rightAt(bestSlot)
        val out = t.outAt(bestSlot)
        // in-place leftmost-first non-overlapping merge
        var w = 0
        var k = 0
        while (k < n) {
          if (k < n - 1 && buf(k) == l && buf(k + 1) == r) {
            buf(w) = out; k += 2
          } else { buf(w) = buf(k); k += 1 }
          w += 1
        }
        n = w
        if (n <= 1) done = true
      }
    }
    val arr = new Array[Int](n)
    System.arraycopy(buf, 0, arr, 0, n)
    new GenericArrayData(arr)
  }

  def decode(idsArr: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder(idsArr.numElements * 2)
    var i = 0
    while (i < idsArr.numElements) {
      val id = idsArr.getInt(i)
      if (id >= 0 && id < vocab.length) sb.append(vocab(id))
      else sb.append('�')
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

object BpeCodec {
  /** Train a classic word-frequency BPE merge table on `sample` texts:
    * words = whitespace-split tokens as UTF-16 unit sequences; each
    * round counts adjacent pairs weighted by word frequency and merges
    * the most frequent (ties broken pair-lexicographically — training
    * is DETERMINISTIC for a fixed sample). Word-based training never
    * learns a space-containing pair, so the full-sequence encoder
    * (which would merge anywhere) still never merges across spaces —
    * the two stay consistent by construction. In-memory on a BOUNDED
    * sample: the industry norm (tokenizers train on a sample, never
    * the 100 TB corpus) — only the encode pass is corpus-sized. */
  def train(sample: Seq[String], nMerges: Int): Seq[String] = {
    val wordFreq = new java.util.HashMap[String, Long]()
    sample.foreach(_.split("\\s+").foreach { w =>
      if (w.nonEmpty) wordFreq.merge(w, 1L, (a, b) => a + b)
    })
    var words: Map[Vector[String], Long] = {
      val b = Map.newBuilder[Vector[String], Long]
      wordFreq.forEach { (w, n) =>
        b += (w.codePoints().toArray.toVector
          .map(cp => new String(Character.toChars(cp))) -> n)
      }
      b.result()
    }
    val out = Vector.newBuilder[String]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (toks, n) =>
        var i = 0
        while (i < toks.length - 1) {
          counts.merge((toks(i), toks(i + 1)), n, (a, b) => a + b)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (p, n) =>
          if (best == null || n > best._2 ||
            (n == best._2 && (p._1 + " " + p._2) < (best._1._1 + " " + best._1._2)))
            best = (p, n)
        }
        val (l, r) = best._1
        out += s"$l $r"
        words = words.map { case (toks, n) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i < toks.length - 1 && toks(i) == l && toks(i + 1) == r) {
              nb += (l + r); i += 2
            } else { nb += toks(i); i += 1 }
          }
          (nb.result(), n)
        }.groupMapReduce(_._1)(_._2)(_ + _)
        round += 1
      }
    }
    out.result()
  }

  /** Precomputed encode tables: flat ASCII id table + unicode
    * CODE-POINT map for the base alphabet, and an open-addressed
    * (left<<32|right) -> slot table carrying rank / merged id per
    * slot. Sentinel key Long.MinValue marks an empty slot (ids are
    * non-negative, so a packed key can never equal it); first
    * insertion per key wins, so a duplicated pair keeps its LOWEST
    * rank, matching putIfAbsent. */
  private[functions] final class Tables(
      asciiIds: Array[Int],
      cpMap: java.util.HashMap[Integer, Integer],
      keys: Array[Long], ranks: Array[Int], outs: Array[Int], mask: Int) {
    def cpId(cp: Int): Int =
      if (cp < 128) asciiIds(cp)
      else {
        val v = cpMap.get(Integer.valueOf(cp))
        if (v == null) -1 else v.intValue
      }
    def findPair(l: Int, r: Int): Int = {
      if (l < 0 || r < 0) return -1
      val key = (l.toLong << 32) | (r.toLong & 0xffffffffL)
      var i = (java.lang.Long.hashCode(key) * -1640531527) & mask
      while (true) {
        val k = keys(i)
        if (k == Long.MinValue) return -1
        if (k == key) return i
        i = (i + 1) & mask
      }
      -1 // unreachable: the table is never full (cap >= 4x entries)
    }
    def rankAt(i: Int): Int = ranks(i)
    def leftAt(i: Int): Int = (keys(i) >>> 32).toInt
    def rightAt(i: Int): Int = keys(i).toInt
    def outAt(i: Int): Int = outs(i)
  }

  private[functions] object Tables {
    def build(merges: Array[String], vocab: Array[String],
        idOf: String => Int): Tables = {
      val ascii = Array.fill(128)(-1)
      val cmap = new java.util.HashMap[Integer, Integer]()
      // single-CODE-POINT vocab ids via idOf so duplicate-entry
      // resolution (first id wins) is identical to the string path;
      // code points above 0x7f land in the map — astral entries (one
      // surrogate PAIR, codePointCount 1) included, exactly the
      // granularity encode splits at
      var c = 0
      while (c < 128) {
        ascii(c) = idOf(String.valueOf(c.toChar)); c += 1
      }
      vocab.foreach { t =>
        if (t.nonEmpty && t.codePointCount(0, t.length) == 1 &&
            t.codePointAt(0) >= 128)
          cmap.putIfAbsent(Integer.valueOf(t.codePointAt(0)),
            Integer.valueOf(idOf(t)))
      }
      var cap = 8
      while (cap < math.max(1, merges.length) * 4) cap <<= 1
      val keys = Array.fill(cap)(Long.MinValue)
      val ranks = new Array[Int](cap)
      val outs = new Array[Int](cap)
      val mask = cap - 1
      merges.zipWithIndex.foreach { case (p, rank) =>
        val sp = p.indexOf(' ')
        val l = idOf(p.substring(0, sp))
        val r = idOf(p.substring(sp + 1))
        val out = idOf(p.substring(0, sp) + p.substring(sp + 1))
        if (l >= 0 && r >= 0 && out >= 0) {
          val key = (l.toLong << 32) | (r.toLong & 0xffffffffL)
          var i = (java.lang.Long.hashCode(key) * -1640531527) & mask
          var placed = false
          while (!placed) {
            if (keys(i) == key) placed = true // lower rank already in
            else if (keys(i) == Long.MinValue) {
              keys(i) = key; ranks(i) = rank; outs(i) = out; placed = true
            } else i = (i + 1) & mask
          }
        }
      }
      new Tables(ascii, cmap, keys, ranks, outs, mask)
    }
  }
}

/** BYTE-level BPE codec — the production-tokenizer granularity
  * (GPT-2/tiktoken shape): base ids 0..255 ARE the UTF-8 bytes, merge
  * rank r mints token id 256+r, so EVERY input is in-vocab by
  * construction (no OOV, no U+FFFD — encode∘decode is the identity on
  * any string, trained or not). The merge table is an array of packed
  * `(left<<32)|right` id pairs in rank order — it rides a plain
  * `array<bigint>` literal (byte sequences need no string vocab, which
  * could not carry arbitrary bytes through UTF-8 anyway). The merge
  * LOOP is [[BpeCodec]]'s, unchanged: lowest-rank adjacent pair,
  * leftmost-first, via the same open-addressed long-keyed probe. */
final class BpeByteCodec(val merges: Array[Long]) extends Serializable {

  @transient private lazy val tables: BpeCodec.Tables = {
    var cap = 8
    while (cap < math.max(1, merges.length) * 4) cap <<= 1
    val keys = Array.fill(cap)(Long.MinValue)
    val ranks = new Array[Int](cap)
    val outs = new Array[Int](cap)
    val mask = cap - 1
    merges.zipWithIndex.foreach { case (key, rank) =>
      var i = (java.lang.Long.hashCode(key) * -1640531527) & mask
      var placed = false
      while (!placed) {
        if (keys(i) == key) placed = true // lower rank already in
        else if (keys(i) == Long.MinValue) {
          keys(i) = key; ranks(i) = rank; outs(i) = 256 + rank
          placed = true
        } else i = (i + 1) & mask
      }
    }
    new BpeCodec.Tables(Array.tabulate(128)(identity), // ascii id = byte
      new java.util.HashMap[Integer, Integer](), keys, ranks, outs, mask)
  }

  def encode(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val t = tables
    val buf = new Array[Int](bytes.length)
    var n = 0
    while (n < bytes.length) { buf(n) = bytes(n) & 0xff; n += 1 }
    var done = n <= 1
    while (!done) {
      var best = Int.MaxValue
      var bestSlot = -1
      var j = 0
      while (j < n - 1) {
        val slot = t.findPair(buf(j), buf(j + 1))
        if (slot >= 0 && t.rankAt(slot) < best) {
          best = t.rankAt(slot); bestSlot = slot
        }
        j += 1
      }
      if (bestSlot < 0) done = true
      else {
        val l = t.leftAt(bestSlot)
        val r = t.rightAt(bestSlot)
        val out = t.outAt(bestSlot)
        var w = 0
        var k = 0
        while (k < n) {
          if (k < n - 1 && buf(k) == l && buf(k + 1) == r) {
            buf(w) = out; k += 2
          } else { buf(w) = buf(k); k += 1 }
          w += 1
        }
        n = w
        if (n <= 1) done = true
      }
    }
    val arr = new Array[Int](n)
    System.arraycopy(buf, 0, arr, 0, n)
    new GenericArrayData(arr)
  }

  /** Token id -> its byte sequence, memoized bottom-up (id 256+r
    * expands to rank r's pair — ranks only reference LOWER ids, so one
    * forward pass settles every token). */
  @transient private lazy val tokenBytes: Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](256 + merges.length)
    var i = 0
    while (i < 256) { out(i) = Array((i & 0xff).toByte); i += 1 }
    merges.zipWithIndex.foreach { case (key, rank) =>
      val l = (key >>> 32).toInt
      val r = key.toInt
      // a rank may only reference bytes or EARLIER-minted tokens — a
      // forward/garbage reference is a malformed table, not a crash
      require(l >= 0 && l < 256 + rank && r >= 0 && r < 256 + rank,
        s"byte-BPE merge $rank references unminted token ($l, $r)")
      out(256 + rank) = out(l) ++ out(r)
    }
    out
  }

  def decode(idsArr: ArrayData): UTF8String = {
    var total = 0
    var i = 0
    while (i < idsArr.numElements) {
      val id = idsArr.getInt(i)
      if (id >= 0 && id < tokenBytes.length) total += tokenBytes(id).length
      i += 1
    }
    val bytes = new Array[Byte](total)
    var off = 0
    i = 0
    while (i < idsArr.numElements) {
      val id = idsArr.getInt(i)
      if (id >= 0 && id < tokenBytes.length) {
        val tb = tokenBytes(id)
        System.arraycopy(tb, 0, bytes, off, tb.length)
        off += tb.length
      }
      i += 1
    }
    UTF8String.fromBytes(bytes)
  }
}

object BpeByteCodec {
  /** Byte-level train: the [[BpeCodec.train]] algebra over UTF-8 byte
    * tokens — each round merges the most frequent adjacent id pair
    * (count-desc, packed-key-asc tie-break: deterministic), minting id
    * 256+round. Returns the packed `(l<<32)|r` pairs in rank order. */
  def train(sample: Seq[String], nMerges: Int): Seq[Long] = {
    val wordFreq = new java.util.HashMap[Vector[Int], Long]()
    sample.foreach(_.split("\\s+").foreach { w =>
      if (w.nonEmpty)
        wordFreq.merge(w.getBytes("UTF-8").toVector.map(_ & 0xff),
          1L, (a, b) => a + b)
    })
    var words: Map[Vector[Int], Long] = {
      val b = Map.newBuilder[Vector[Int], Long]
      wordFreq.forEach { (w, n) => b += (w -> n) }
      b.result()
    }
    val out = Vector.newBuilder[Long]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val counts = new java.util.HashMap[Long, Long]()
      words.foreach { case (toks, n) =>
        var i = 0
        while (i < toks.length - 1) {
          counts.merge((toks(i).toLong << 32) | (toks(i + 1).toLong & 0xffffffffL),
            n, (a, b) => a + b)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var bestKey = 0L
        var bestN = -1L
        counts.forEach { (k, n) =>
          if (n > bestN || (n == bestN && k < bestKey)) {
            bestKey = k; bestN = n
          }
        }
        val l = (bestKey >>> 32).toInt
        val r = bestKey.toInt
        val minted = 256 + round
        out += bestKey
        words = words.map { case (toks, n) =>
          val nb = Vector.newBuilder[Int]
          var i = 0
          while (i < toks.length) {
            if (i < toks.length - 1 && toks(i) == l && toks(i + 1) == r) {
              nb += minted; i += 2
            } else { nb += toks(i); i += 1 }
          }
          (nb.result(), n)
        }.groupMapReduce(_._1)(_._2)(_ + _)
        round += 1
      }
    }
    out.result()
  }
}

/** `graft_bpe_encode_bytes(text, merges)` — byte-level token ids; the
  * packed merge table must be a foldable `array<bigint>` literal. */
case class BpeEncodeBytes(text: Expression, mergesExpr: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def left: Expression = text
  override def right: Expression = mergesExpr
  override def prettyName: String = "graft_bpe_encode_bytes"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def inputTypes: Seq[DataType] =
    Seq(StringType, ArrayType(org.apache.spark.sql.types.LongType))
  override def nullable: Boolean = text.nullable

  @transient private[functions] lazy val codec: BpeByteCodec = {
    require(mergesExpr.foldable,
      "graft_bpe_encode_bytes: merges must be a literal array")
    val v = mergesExpr.eval(null)
    require(v != null, "graft_bpe_encode_bytes: merges must not be null")
    new BpeByteCodec(v.asInstanceOf[ArrayData].toLongArray())
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) null else codec.encode(t.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeByteCodec", codec,
      classOf[BpeByteCodec].getName)
    val t = text.genCode(ctx)
    ev.copy(code = code"""
      ${t.code}
      boolean ${ev.isNull} = ${t.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) { ${ev.value} = $ref.encode(${t.value}); }""")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(text = newLeft, mergesExpr = newRight)
}

/** `graft_bpe_decode_bytes(ids, merges)` — the byte-level inverse. */
case class BpeDecodeBytes(idsExpr: Expression, mergesExpr: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def left: Expression = idsExpr
  override def right: Expression = mergesExpr
  override def prettyName: String = "graft_bpe_decode_bytes"
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(org.apache.spark.sql.types.LongType))
  override def nullable: Boolean = idsExpr.nullable

  @transient private lazy val codec: BpeByteCodec = {
    require(mergesExpr.foldable,
      "graft_bpe_decode_bytes: merges must be a literal array")
    val v = mergesExpr.eval(null)
    require(v != null, "graft_bpe_decode_bytes: merges must not be null")
    new BpeByteCodec(v.asInstanceOf[ArrayData].toLongArray())
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val ids = idsExpr.eval(input)
    if (ids == null) null else codec.decode(ids.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeByteCodec", codec,
      classOf[BpeByteCodec].getName)
    val t = idsExpr.genCode(ctx)
    ev.copy(code = code"""
      ${t.code}
      boolean ${ev.isNull} = ${t.isNull};
      UTF8String ${ev.value} = null;
      if (!${ev.isNull}) { ${ev.value} = $ref.decode(${t.value}); }""")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(idsExpr = newLeft, mergesExpr = newRight)
}

/** `graft_bpe_encode(text, merges, vocab)` — array<int> token ids.
  * `merges`/`vocab` must be FOLDABLE array literals (the broadcast
  * merge-rank table); only the text column is evaluated per row, and
  * the generated code calls the prebuilt codec directly — no UDF
  * boxing, stays inside whole-stage codegen. */
case class BpeEncode(text: Expression, mergesExpr: Expression,
    vocabExpr: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def first: Expression = text
  override def second: Expression = mergesExpr
  override def third: Expression = vocabExpr
  override def prettyName: String = "graft_bpe_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def inputTypes: Seq[DataType] =
    Seq(StringType, ArrayType(StringType), ArrayType(StringType))
  override def nullable: Boolean = text.nullable

  private def strArray(e: Expression, what: String): Array[String] = {
    require(e.foldable, s"graft_bpe_encode: $what must be a literal array")
    val v = e.eval(null)
    require(v != null, s"graft_bpe_encode: $what must not be null")
    v.asInstanceOf[ArrayData].toArray[UTF8String](StringType).map(_.toString)
  }
  @transient private[functions] lazy val codec: BpeCodec =
    new BpeCodec(strArray(mergesExpr, "merges"), strArray(vocabExpr, "vocab"))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) null else codec.encode(t.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCodec", codec, classOf[BpeCodec].getName)
    val t = text.genCode(ctx)
    ev.copy(code = code"""
      ${t.code}
      boolean ${ev.isNull} = ${t.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) { ${ev.value} = $ref.encode(${t.value}); }""")
  }
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(text = newFirst, mergesExpr = newSecond, vocabExpr = newThird)
}

/** `graft_bpe_decode(ids, vocab)` — the inverse: token ids back to
  * text (out-of-vocab ids render U+FFFD). Same foldable-vocab rule. */
case class BpeDecode(idsExpr: Expression, vocabExpr: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def left: Expression = idsExpr
  override def right: Expression = vocabExpr
  override def prettyName: String = "graft_bpe_decode"
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(StringType))
  override def nullable: Boolean = idsExpr.nullable

  @transient private lazy val codec: BpeCodec = {
    require(vocabExpr.foldable, "graft_bpe_decode: vocab must be a literal array")
    val v = vocabExpr.eval(null)
    require(v != null, "graft_bpe_decode: vocab must not be null")
    new BpeCodec(Array.empty,
      v.asInstanceOf[ArrayData].toArray[UTF8String](StringType).map(_.toString))
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val ids = idsExpr.eval(input)
    if (ids == null) null else codec.decode(ids.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCodec", codec, classOf[BpeCodec].getName)
    val t = idsExpr.genCode(ctx)
    ev.copy(code = code"""
      ${t.code}
      boolean ${ev.isNull} = ${t.isNull};
      UTF8String ${ev.value} = null;
      if (!${ev.isNull}) { ${ev.value} = $ref.decode(${t.value}); }""")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(idsExpr = newLeft, vocabExpr = newRight)
}

object BpeExpressions {
  /** Idempotently registers the BPE codec expressions. */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_encode", exprs => BpeEncode(exprs(0), exprs(1), exprs(2)),
      "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_decode", exprs => BpeDecode(exprs(0), exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_encode_bytes",
      exprs => BpeEncodeBytes(exprs(0), exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_decode_bytes",
      exprs => BpeDecodeBytes(exprs(0), exprs(1)), "built-in")
  }
  def bpe_encode(text: Column, merges: Column, vocab: Column): Column =
    call_function("graft_bpe_encode", text, merges, vocab)
  def bpe_decode(ids: Column, vocab: Column): Column =
    call_function("graft_bpe_decode", ids, vocab)
  def bpe_encode_bytes(text: Column, merges: Column): Column =
    call_function("graft_bpe_encode_bytes", text, merges)
  def bpe_decode_bytes(ids: Column, merges: Column): Column =
    call_function("graft_bpe_decode_bytes", ids, merges)
}
