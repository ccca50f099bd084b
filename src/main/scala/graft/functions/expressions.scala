package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the operators Spark's built-ins can't
  * express efficiently (SURVEY.md §4). All are deterministic, null-
  * intolerant scalar expressions; the hot-path ones implement `doGenCode`
  * so they stay inside whole-stage codegen instead of falling back to
  * interpreted eval.
  */
object GraftFunctions {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}

  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))
  def json_field_state(json: Column, path: String): Column =
    column(JsonFieldState(expression(json), Literal(path)))
  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))
  def minhash_sig(tokens: Column, k: Int): Column =
    column(MinHashSig(expression(tokens), Literal(k)))
  def shingle_minhash(tokens: Column, n: Int, k: Int): Column =
    column(ShingleMinHash(expression(tokens), Literal(n), Literal(k)))
  def shingle_hashes(tokens: Column, n: Int): Column =
    column(ShingleHashes(expression(tokens), Literal(n)))
  def bitmap_distinct(c: Column): Column =
    column(BitmapDistinct(expression(c)).toAggregateExpression())
  def heavy_hitters(c: Column, capacity: Int, k: Int): Column =
    column(HeavyHitters(expression(c), capacity, k).toAggregateExpression())
  def bottom_k_sample(h: Column, id: Column, k: Int): Column =
    column(BottomKSample(expression(h), expression(id), k).toAggregateExpression())
  def argmax_ties(value: Column, key: Column): Column =
    column(ArgMaxTies(expression(value), expression(key)).toAggregateExpression())

  def hyperplane_buckets(v: Column, bits: Int, tables: Int): Column =
    column(HyperplaneBuckets(expression(v), Literal(bits), Literal(tables)))

  def pq_encode(v: Column, codebook: Column, m: Int, ksub: Int): Column =
    column(PqEncode(expression(v), expression(codebook), m, ksub))
  def pq_lut(v: Column, codebook: Column, m: Int, ksub: Int): Column =
    column(PqLut(expression(v), expression(codebook), m, ksub))
  def pq_adc_dist(codes: Column, lut: Column): Column =
    column(PqAdcDist(expression(codes), expression(lut)))
  /** One flat float-array literal (a single Literal node). */
  def float_array_lit(a: Array[Float]): Column =
    column(Literal.create(a, ArrayType(FloatType, containsNull = false)))

  def bpe_tokens(text: Column, merges: Column): Column =
    column(BpeTokens(expression(text), expression(merges)))

  def recover_signer(payload: Column, sig: Column): Column =
    column(graft.functions.crypto.RecoverSigner(expression(payload), expression(sig)))
  def eip712_sign(payload: Column, key: Column): Column =
    column(graft.functions.crypto.Eip712Sign(expression(payload), expression(key)))
  /** One flat string-array literal (a single Literal node). */
  def string_array_lit(a: Seq[String]): Column =
    column(Literal.create(a, ArrayType(StringType, containsNull = false)))

  def vec_sum(v: Column, dim: Int): Column =
    column(VecSum(expression(v), dim).toAggregateExpression())
  def gram_matrix(v: Column, dim: Int): Column =
    column(GramMatrix(expression(v), dim).toAggregateExpression())
  def affine_project(v: Column, mat: Column, outDim: Int): Column =
    column(AffineProject(expression(v), expression(mat), outDim))

  /** splitmix64 finalizer — the shared pseudo-hyperplane/permutation
    * seed mixer. Public so the declarative and expression LSH paths stay
    * bit-identical. */
  def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over UTF-8 bytes — the shared token hash for
    * SimHash/MinHash. Public so tests can cross-check. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}

/** Cosine similarity of two float vectors, accumulated in double.
  * Codegen'd: the 64-float dot product runs as a tight scalar loop inside
  * whole-stage codegen — this is the hot inner loop of brute-force ANN
  * (O(n·q·d) evaluations at scale). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val denom = ctx.freshName("denom")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double x = (double) $a.getFloat($i);
          double y = (double) $b.getFloat($i);
          $dot += x * y; $na += x * x; $nb += y * y;
        }
        double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 64-bit SimHash over an array of string tokens (FNV-1a token hashes,
  * unit weights). Standard construction: per bit, sum +1/-1 across token
  * hashes; sign of the sum is the output bit. */
/** Streaming one-pass classifier of a JSON field's null-ish state —
  * the probe the schemaless UnaryFilter surface needs (reference:
  * db3_database_v2.proto:127-129 UnaryFilter IS_NULL/IS_NOT_NULL):
  * returns 0 = MISSING (path absent, parent not an object, or malformed
  * JSON), 1 = present with JSON null, 2 = present with a non-null value.
  * `get_json_object` cannot make the 0-vs-1 distinction (SQL NULL for
  * both), and the `json_object_keys(parent)`+raw two-probe form streams
  * the document twice and allocates a keys array per row; this walks the
  * dotted path once with Jackson's streaming parser, early-exits at the
  * first match, and allocates nothing. First occurrence wins on
  * duplicate keys (get_json_object's behavior). Codegen'd: the state
  * call inlines into the scan's Filter like every other probe. */
object JsonFieldStateEval {
  import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
  private val factory = new JsonFactory()

  def stateOf(json: String, segs: Array[String]): Int =
    try {
      val p = factory.createParser(json)
      try {
        if (p.nextToken() != JsonToken.START_OBJECT) 0
        else walk(p, segs, 0)
      } finally p.close()
    } catch { case scala.util.control.NonFatal(_) => 0 }

  /** Inside an object (START_OBJECT consumed): find segs(i), descend or
    * classify. skipChildren is a no-op on scalar value tokens. */
  @annotation.tailrec
  private def walk(p: JsonParser, segs: Array[String], i: Int): Int = {
    if (p.nextToken() != JsonToken.FIELD_NAME) return 0 // END_OBJECT: absent
    val name = p.currentName()
    val t = p.nextToken() // the value token
    if (name == segs(i)) {
      if (i == segs.length - 1) {
        if (t == JsonToken.VALUE_NULL) 1 else 2
      } else if (t != JsonToken.START_OBJECT) 0 // path into scalar/array
      else walk(p, segs, i + 1)
    } else {
      p.skipChildren()
      walk(p, segs, i)
    }
  }
}

/** See [[JsonFieldStateEval]]; `path` must be a foldable string literal
  * (a dotted field path, compiled to segments once at plan time). */
case class JsonFieldState(json: Expression, path: Expression)
    extends BinaryExpression {

  override def left: Expression = json
  override def right: Expression = path
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (json.dataType != StringType || path.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "json_field_state expects (string json, string path)")
    else if (!path.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "json_field_state path must be a literal")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  @transient private lazy val segs: Array[String] =
    path.eval().asInstanceOf[UTF8String].toString.split('.')

  override def nullSafeEval(j: Any, p: Any): Any =
    JsonFieldStateEval.stateOf(j.asInstanceOf[UTF8String].toString, segs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, _) => {
      val segsRef = ctx.addReferenceObj("segs", segs, "java.lang.String[]")
      s"""${ev.value} = graft.functions.JsonFieldStateEval$$.MODULE$$
         |  .stateOf($j.toString(), $segsRef);""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(json = l, path = r)
}

case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = GraftFunctions.fnv1a64(arr.getUTF8String(t).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature: k permutations h_i(x) = a_i*fnv(x) + b_i (odd a_i,
  * mixing in 64-bit space), min over the token set per permutation.
  * Returns array<long> of length k. */
case class MinHashSig(child: Expression, kExpr: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = child
  override def right: Expression = kExpr
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def foldable: Boolean = false

  // deterministic per-permutation coefficients (splitmix64 of the index)
  private def coef(i: Int): (Long, Long) = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (mix(i.toLong * 2 + 1) | 1L, mix(i.toLong * 2 + 2))
  }

  @transient private var cachedK: Int = -1
  @transient private var as: Array[Long] = _
  @transient private var bs: Array[Long] = _

  override def nullSafeEval(tokens: Any, k: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val perms = k.asInstanceOf[Int]
    if (perms != cachedK) {
      as = Array.tabulate(perms)(coef(_)._1)
      bs = Array.tabulate(perms)(coef(_)._2)
      cachedK = perms
    }
    val out = new Array[Long](perms)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = GraftFunctions.fnv1a64(arr.getUTF8String(t).getBytes)
        var i = 0
        while (i < perms) {
          val v = as(i) * h + bs(i)
          if (v < out(i)) out(i) = v
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(child = l, kExpr = r)
}

/** MinHash over word n-gram shingles, fused: hashes each n-gram's bytes
  * (tokens joined by a single space) directly off the token array, never
  * materializing shingle strings — same signature values as
  * `MinHashSig(shingles(text))` at a fraction of the allocation cost.
  * This is the hot path of MinHash-LSH dedup over a 100 TB corpus. */
case class ShingleMinHash(tokens: Expression, nExpr: Expression, kExpr: Expression)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = tokens
  override def second: Expression = nExpr
  override def third: Expression = kExpr
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private def coef(i: Int): (Long, Long) = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (mix(i.toLong * 2 + 1) | 1L, mix(i.toLong * 2 + 2))
  }

  @transient private var cachedK: Int = -1
  @transient private var as: Array[Long] = _
  @transient private var bs: Array[Long] = _

  override def nullSafeEval(toks: Any, nAny: Any, kAny: Any): Any = {
    val arr = toks.asInstanceOf[ArrayData]
    val n = nAny.asInstanceOf[Int]
    val perms = kAny.asInstanceOf[Int]
    if (perms != cachedK) {
      as = Array.tabulate(perms)(coef(_)._1)
      bs = Array.tabulate(perms)(coef(_)._2)
      cachedK = perms
    }
    val t = arr.numElements()
    val bytes = new Array[Array[Byte]](t)
    var i = 0
    while (i < t) {
      bytes(i) = if (arr.isNullAt(i)) Array.emptyByteArray
        else arr.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](perms)
    java.util.Arrays.fill(out, Long.MaxValue)
    i = 0
    while (i + n <= t) {
      // FNV-1a over "tok_i tok_{i+1} ... tok_{i+n-1}" without concat
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < n) {
        if (j > 0) { h ^= ' '.toLong; h *= 0x100000001b3L }
        val bs0 = bytes(i + j)
        var b = 0
        while (b < bs0.length) {
          h ^= (bs0(b) & 0xffL); h *= 0x100000001b3L
          b += 1
        }
        j += 1
      }
      var p = 0
      while (p < perms) {
        val v = as(p) * h + bs(p)
        if (v < out(p)) out(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(tokens = f, nExpr = s, kExpr = t)
}

/** Exact distinct count of a bounded non-negative long key via a bitmap
  * buffer — a `TypedImperativeAggregate` (mutable buffer + binary
  * serialization between partial and final aggregation, like production
  * HLL/bitmap sketches). For id-dense keys this is both exact and far
  * smaller on the wire than a hash-set distinct: the partial state is
  * one bit per present id. */
case class BitmapDistinct(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[java.util.BitSet]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): java.util.BitSet = new java.util.BitSet()

  override def update(buffer: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      require(id >= 0 && id <= Int.MaxValue, s"id $id out of bitmap range")
      buffer.set(id.toInt)
    }
    buffer
  }

  override def merge(b: java.util.BitSet, o: java.util.BitSet): java.util.BitSet = {
    b.or(o); b
  }

  override def eval(buffer: java.util.BitSet): Any = buffer.cardinality().toLong

  override def serialize(buffer: java.util.BitSet): Array[Byte] = buffer.toByteArray

  override def deserialize(storageFormat: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(storageFormat)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Mergeable Misra-Gries heavy-hitters summary over a long key — the
  * frequent-items sketch behind approximate top-k at 100 TB: partial
  * state is AT MOST `capacity` (key, count) counters per group per
  * partition, independent of stream length or key cardinality.
  *
  * Counts are lower bounds with error ≤ n/(capacity+1) (n = group
  * size): every key with true frequency above that bound is guaranteed
  * present. Merge is the Mergeable-Summaries construction (Agarwal et
  * al., PODS'12): sum counters keyed, then subtract the (capacity+1)-th
  * largest count and drop non-positive — associative, so Spark's
  * partial/final aggregation is exactly the sketch's native merge.
  * When `capacity` exceeds the group's distinct-key count no decrement
  * ever fires and the summary is EXACT — which is what makes the
  * driver query oracle-checkable against plain GROUP BY counts at test
  * scale while the same plan stays memory-bounded at 100 TB.
  *
  * eval sorts by (count desc, key asc) and emits the top `k` as
  * struct(key, cnt) — deterministic under ties. */
case class HeavyHitters(child: Expression, capacity: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[java.util.HashMap[java.lang.Long, java.lang.Long]]
    with UnaryLike[Expression] with ExpectsInputTypes {
  require(capacity > 0 && k > 0 && k <= capacity)

  // BIGINT keys only: fail at analysis, not with an executor-side cast
  override def inputTypes: Seq[DataType] = Seq(LongType)

  private type Buf = java.util.HashMap[java.lang.Long, java.lang.Long]

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buffer: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = java.lang.Long.valueOf(v.asInstanceOf[Long])
      val cur = buffer.get(key)
      if (cur != null) buffer.put(key, cur + 1L)
      else if (buffer.size < capacity) buffer.put(key, 1L)
      else {
        // classic MG decrement: all counters -1, drop zeros (amortized
        // O(1) per input — each decrement pays off capacity inputs)
        val it = buffer.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buffer
  }

  override def merge(b: Buf, o: Buf): Buf = {
    val it = o.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = b.get(e.getKey)
      b.put(e.getKey, if (cur == null) e.getValue else java.lang.Long.valueOf(cur + e.getValue))
    }
    if (b.size > capacity) {
      val counts = new Array[Long](b.size)
      var i = 0
      val vs = b.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(b.size - capacity - 1) // (capacity+1)-th largest
      val it2 = b.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        if (e.getValue <= cut) it2.remove() else e.setValue(e.getValue - cut)
      }
    }
    b
  }

  override def eval(buffer: Buf): Any = {
    val entries = new Array[(Long, Long)](buffer.size)
    var i = 0
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey.longValue(), e.getValue.longValue()); i += 1
    }
    val top = entries.sortBy { case (key, cnt) => (-cnt, key) }.take(k)
    new GenericArrayData(top.map { case (key, cnt) =>
      InternalRow(key, cnt)
    })
  }

  override def serialize(buffer: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new Buf(Math.max(16, n * 2))
    var i = 0
    while (i < n) { b.put(bb.getLong, bb.getLong); i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Exact mergeable bottom-k-by-hash sample: keeps the k (hash, id) pairs
  * with the smallest hash seen so far — a fixed-size DETERMINISTIC uniform
  * sample (the batch `pipeline_reservoir` semantics) that merges across
  * partitions and across streaming micro-batches, because "bottom-k of a
  * union" = "bottom-k of the merged bottom-k's". State is exactly ≤ k
  * pairs (16 B each) per group regardless of stream length; identical
  * (hash, id) re-arrivals are idempotent (set semantics). Output: the
  * sample ascending by (hash, id) — reproducible on any partitioning,
  * any arrival order. */
case class BottomKSample(left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression]
    with ExpectsInputTypes {
  require(k > 0)

  // analysis-time contract: both operands are BIGINT, so a mistyped SQL
  // call fails with a clear error instead of an executor-side
  // ClassCastException in update()
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  private type Buf = java.util.TreeSet[(Long, Long)]

  private def newBuf(): Buf = new java.util.TreeSet[(Long, Long)](
    implicitly[Ordering[(Long, Long)]])

  override def createAggregationBuffer(): Buf = newBuf()

  override def update(buffer: Buf, input: InternalRow): Buf = {
    val h = left.eval(input)
    val id = right.eval(input)
    if (h != null && id != null) {
      buffer.add((h.asInstanceOf[Long], id.asInstanceOf[Long]))
      if (buffer.size > k) buffer.pollLast()
    }
    buffer
  }

  override def merge(b: Buf, o: Buf): Buf = {
    val it = o.iterator()
    while (it.hasNext) {
      b.add(it.next())
      if (b.size > k) b.pollLast()
    }
    b
  }

  override def eval(buffer: Buf): Any = {
    val out = new Array[Any](buffer.size)
    var i = 0
    val it = buffer.iterator()
    while (it.hasNext) {
      val (h, id) = it.next()
      out(i) = InternalRow(h, id); i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) { val (h, id) = it.next(); bb.putLong(h); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = newBuf()
    var i = 0
    while (i < n) { b.add((bb.getLong, bb.getLong)); i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Exact arg-max WITH TIES in one aggregation: the single best value
  * seen so far plus EVERY key attaining it. The q15 "top supplier(s)"
  * shape needs the full tied set, which plain `max_by` drops; deriving
  * it via groupBy(value) + collect_list + max_by costs an extra shuffle
  * over the distinct values. Here the partial state is one
  * (value, tied-keys) candidate per partition — merge keeps the larger
  * value and unions keys on exact equality — so the final reduce ships
  * one candidate per partition regardless of input size, and no task
  * ever materializes more than the tied set. Value comparison uses the
  * type's interpreted ordering (decimal-EXACT for decimal revenue:
  * ties are equal decimals, never almost-equal doubles). Output:
  * struct(value, keys ascending) — deterministic; null on empty input. */
case class ArgMaxTies(left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[ArgMaxTies.Buf]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  // analysis-time contract: any ORDERABLE value, BIGINT keys — fail in
  // analysis, not with an executor-side ClassCastException in update()
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (right.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName key must be BIGINT, got ${right.dataType.catalogString}")
    else org.apache.spark.sql.catalyst.util.TypeUtils
      .checkForOrderingExpr(left.dataType, prettyName)
  }

  @transient private lazy val ordering: Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(left.dataType)

  import ArgMaxTies.Buf

  override def createAggregationBuffer(): Buf =
    new Buf(null, scala.collection.mutable.ArrayBuffer.empty[Long])

  override def update(b: Buf, input: InternalRow): Buf = {
    val v = left.eval(input)
    if (v != null) {
      val k = right.eval(input)
      if (k != null) {
        // copyValue: eval may return a buffer-backed value (UTF8String,
        // byte[], struct) that the NEXT row's read overwrites — a
        // captured running max must own its bytes
        if (b.value == null) {
          b.value = InternalRow.copyValue(v); b.keys += k.asInstanceOf[Long]
        } else {
          val c = ordering.compare(v, b.value)
          if (c > 0) {
            b.value = InternalRow.copyValue(v)
            b.keys.clear(); b.keys += k.asInstanceOf[Long]
          } else if (c == 0) b.keys += k.asInstanceOf[Long]
        }
      }
    }
    b
  }

  override def merge(b: Buf, o: Buf): Buf = {
    if (o.value != null) {
      if (b.value == null) { b.value = o.value; b.keys ++= o.keys }
      else {
        val c = ordering.compare(o.value, b.value)
        if (c > 0) { b.value = o.value; b.keys.clear(); b.keys ++= o.keys }
        else if (c == 0) b.keys ++= o.keys
      }
    }
    b
  }

  override def eval(b: Buf): Any =
    if (b.value == null) null
    else {
      val ks = b.keys.toArray
      java.util.Arrays.sort(ks)
      InternalRow(b.value, new GenericArrayData(ks))
    }

  // partial state is tiny (one value + tied keys); Java serialization
  // handles every Catalyst value type (Decimal, UTF8String, boxed
  // primitives) without a per-type codec
  override def serialize(b: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(b.value)
    oos.writeObject(b.keys.toArray)
    oos.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
    val v = ois.readObject()
    val ks = ois.readObject().asInstanceOf[Array[Long]]
    ois.close()
    new Buf(v, scala.collection.mutable.ArrayBuffer.empty[Long] ++= ks)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("value", left.dataType, nullable = false),
    StructField("keys", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(newOffset: Int): ArgMaxTies =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgMaxTies =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object ArgMaxTies {
  /** (best value, every key tied at it); value null = empty. */
  final class Buf(var value: Any,
      val keys: scala.collection.mutable.ArrayBuffer[Long])
}

/** Distinct 64-bit FNV-1a hashes of the word n-gram shingles of a token
  * array — the inverted-index key set for the exact set-similarity join
  * (an 8-byte key shuffles instead of the n-gram string). */
case class ShingleHashes(tokens: Expression, nExpr: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = tokens
  override def right: Expression = nExpr
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(toks: Any, nAny: Any): Any = {
    val arr = toks.asInstanceOf[ArrayData]
    val n = nAny.asInstanceOf[Int]
    val t = arr.numElements()
    val bytes = new Array[Array[Byte]](t)
    var i = 0
    while (i < t) {
      bytes(i) = if (arr.isNullAt(i)) Array.emptyByteArray
        else arr.getUTF8String(i).getBytes
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    i = 0
    while (i + n <= t) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < n) {
        if (j > 0) { h ^= ' '.toLong; h *= 0x100000001b3L }
        val bs0 = bytes(i + j)
        var b = 0
        while (b < bs0.length) {
          h ^= (bs0(b) & 0xffL); h *= 0x100000001b3L
          b += 1
        }
        j += 1
      }
      if (seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(tokens = l, nExpr = r)
}

/** All `tables` random-hyperplane LSH buckets of a float vector in ONE
  * pass: bucket_t packs `bits` sign bits, plane component (t, b, j) is
  * derived on the fly from splitmix64 — identical math to the declarative
  * composition in graft.pipeline.Ann, but as one O(tables·bits·dim)
  * scalar loop instead of a ~4k-literal expression tree (which costs
  * seconds of janino compilation and defeats constant folding). */
case class HyperplaneBuckets(vec: Expression, bitsExpr: Expression,
    tablesExpr: Expression)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = vec
  override def second: Expression = bitsExpr
  override def third: Expression = tablesExpr
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any, bitsAny: Any, tablesAny: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val bits = bitsAny.asInstanceOf[Int]
    val tables = tablesAny.asInstanceOf[Int]
    val dim = arr.numElements()
    val x = new Array[Double](dim)
    var j = 0
    while (j < dim) { x(j) = arr.getFloat(j).toDouble; j += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var k = 0
        while (k < dim) {
          val plane = GraftFunctions.splitmix64(
            t.toLong * 0x10000L + b.toLong * 1024L + k).toDouble / Long.MaxValue
          dot += x(k) * plane
          k += 1
        }
        if (dot > 0) bucket += (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      th: Expression): Expression = copy(vec = f, bitsExpr = s, tablesExpr = th)
}

/** Product-quantization encoder: split the (L2-normalized) vector into
  * `m` contiguous subspaces and emit, per subspace, the index of the
  * nearest sub-codebook centroid — `m` BYTES per vector (vs 4·dim for
  * the raw floats; 32× at dim=64/m=8). Normalizing inside the encoder
  * makes squared-L2 ADC ranking equivalent to cosine ranking.
  * `codebook` is one flat float-array literal (a single Literal node —
  * not a lit()-tree — so plan size stays O(1)) laid out
  * [(subspace·ksub + centroid)·subdim + i]. Index build path: runs once
  * per corpus row per index build, so interpreted eval is acceptable
  * (the per-row cost is the m·ksub·subdim distance loop, not dispatch).
  */
case class PqEncode(vec: Expression, codebook: Expression, m: Int, ksub: Int)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = vec
  override def right: Expression = codebook
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any, cb: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val c = cb.asInstanceOf[ArrayData]
    val d = x.numElements()
    val sub = d / m
    var nrm = 0.0
    var i = 0
    while (i < d) { val xi = x.getFloat(i).toDouble; nrm += xi * xi; i += 1 }
    val inv = if (nrm == 0.0) 0.0 else 1.0 / math.sqrt(nrm)
    val codes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val vbase = j * sub
      var best = 0
      var bestD = Double.MaxValue
      var cc = 0
      while (cc < ksub) {
        val cbase = (j * ksub + cc) * sub
        var dist = 0.0
        var t = 0
        while (t < sub) {
          val diff = x.getFloat(vbase + t) * inv - c.getFloat(cbase + t)
          dist += diff * diff
          t += 1
        }
        if (dist < bestD) { bestD = dist; best = cc } // strict <: lowest id wins ties
        cc += 1
      }
      codes(j) = best.toByte
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, codebook = r)
}

/** Per-query ADC lookup table: squared L2 distance from each subspace of
  * the (normalized) query to every sub-codebook centroid — m·ksub floats.
  * Computed once per QUERY row (the tiny broadcast side), so the corpus
  * scan degenerates to table lookups (PqAdcDist). */
case class PqLut(vec: Expression, codebook: Expression, m: Int, ksub: Int)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = vec
  override def right: Expression = codebook
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any, cb: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val c = cb.asInstanceOf[ArrayData]
    val d = x.numElements()
    val sub = d / m
    var nrm = 0.0
    var i = 0
    while (i < d) { val xi = x.getFloat(i).toDouble; nrm += xi * xi; i += 1 }
    val inv = if (nrm == 0.0) 0.0 else 1.0 / math.sqrt(nrm)
    val out = new Array[Float](m * ksub)
    var j = 0
    while (j < m) {
      val vbase = j * sub
      var cc = 0
      while (cc < ksub) {
        val cbase = (j * ksub + cc) * sub
        var dist = 0.0
        var t = 0
        while (t < sub) {
          val diff = x.getFloat(vbase + t) * inv - c.getFloat(cbase + t)
          dist += diff * diff
          t += 1
        }
        out(j * ksub + cc) = dist.toFloat
        cc += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, codebook = r)
}

/** ADC (asymmetric distance computation) kernel: approximate squared L2
  * between a query and a PQ-coded vector = Σ_j lut[j·ksub + codes[j]].
  * THE hot loop of a PQ scan — m table lookups per corpus vector instead
  * of a dim-length float loop — so it implements doGenCode and stays
  * inside whole-stage codegen. */
case class PqAdcDist(codes: Expression, lut: Expression)
    extends BinaryExpression {

  override def left: Expression = codes
  override def right: Expression = lut
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(cAny: Any, lAny: Any): Any = {
    val cs = cAny.asInstanceOf[ArrayData]
    val lut = lAny.asInstanceOf[ArrayData]
    val m = cs.numElements()
    val ksub = if (m == 0) 0 else lut.numElements() / m
    var sum = 0.0
    var j = 0
    while (j < m) {
      sum += lut.getFloat(j * ksub + (cs.getByte(j) & 0xff))
      j += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val m = ctx.freshName("m")
      val ksub = ctx.freshName("ksub")
      val j = ctx.freshName("j")
      val sum = ctx.freshName("sum")
      s"""
        int $m = $c.numElements();
        int $ksub = ($m == 0) ? 0 : $l.numElements() / $m;
        double $sum = 0.0;
        for (int $j = 0; $j < $m; $j++) {
          $sum += $l.getFloat($j * $ksub + ($c.getByte($j) & 0xff));
        }
        ${ev.value} = $sum;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(codes = l, lut = r)
}

/** Vector sum aggregate: element-wise sum of float-array rows into a
  * double[] buffer — the partial-aggregable first moment for centering /
  * normalization (pairs with GramMatrix for covariance). Buffer is dim
  * doubles; merge is element-wise add, so the exchange carries one
  * vector per partition, never the rows. */
case class VecSum(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val n = math.min(dim, a.numElements())
      var i = 0
      while (i < n) { buf(i) += a.getFloat(i); i += 1 }
    }
    buf
  }

  override def merge(b: Array[Double], o: Array[Double]): Array[Double] = {
    var i = 0
    while (i < dim) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * dim)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](dim)
    java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Gram-matrix aggregate: Σ x·xᵀ over float-array rows, accumulated in a
  * flat dim×dim double buffer (row-major). The second moment for
  * covariance/PCA — the classic "wide partial aggregate" shape: each
  * partition folds its rows locally (dim² flops/row, zero allocation),
  * and the exchange carries ONE dim² buffer per partition (32 KB at
  * dim=64), never n·dim² — the same reason HLL sketches scale. */
case class GramMatrix(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim * dim)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val n = math.min(dim, a.numElements())
      var i = 0
      while (i < n) {
        val xi = a.getFloat(i).toDouble
        val base = i * dim
        var j = 0
        while (j < n) { buf(base + j) += xi * a.getFloat(j); j += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(b: Array[Double], o: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b.length) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Affine projection: out[r] = Σ_i M[r·(dim+1)+i]·x[i] + M[r·(dim+1)+dim]
  * — a k×(dim+1) row-major matrix (rotation + offset in one) applied to a
  * float vector. The distributed half of PCA: the basis is a driver
  * artifact (one flat literal), the projection is a per-row kernel. */
case class AffineProject(vec: Expression, mat: Expression, outDim: Int)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = vec
  override def right: Expression = mat
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any, m: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val mm = m.asInstanceOf[ArrayData]
    val dim = x.numElements()
    val out = new Array[Float](outDim)
    var r = 0
    while (r < outDim) {
      val base = r * (dim + 1)
      var acc = mm.getFloat(base + dim).toDouble
      var i = 0
      while (i < dim) { acc += mm.getFloat(base + i).toDouble * x.getFloat(i); i += 1 }
      out(r) = acc.toFloat
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, mat = r)
}

/** BPE tokenize: split `text` on single spaces, apply ranked BPE merges
  * greedily per word (lowest-rank adjacent pair first — the standard
  * GPT-2-style apply loop), return the concatenated token array. Merges
  * arrive as one array<string> literal of "left right" pairs in rank
  * order (a single Literal node); the rank map and a per-word memo are
  * built once per expression instance — the literal is constant, so
  * per-row work is a hash lookup for every repeated word. */
case class BpeTokens(text: Expression, merges: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = text
  override def right: Expression = merges
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private var ranks: java.util.HashMap[(String, String), Int] = _
  @transient private var memo: java.util.HashMap[String, Array[String]] = _

  private def ensureRanks(m: ArrayData): Unit = {
    if (ranks == null) {
      ranks = new java.util.HashMap[(String, String), Int]()
      memo = new java.util.HashMap[String, Array[String]]()
      var i = 0
      val n = m.numElements()
      while (i < n) {
        val s = m.getUTF8String(i).toString
        val sp = s.indexOf(' ')
        ranks.put((s.substring(0, sp), s.substring(sp + 1)), i)
        i += 1
      }
    }
  }

  private def encodeWord(w: String): Array[String] = {
    val hit = memo.get(w)
    if (hit != null) return hit
    var toks = w.map(_.toString).toArray
    var done = false
    while (!done && toks.length > 1) {
      // find the lowest-rank adjacent pair
      var bestRank = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        val r = ranks.getOrDefault((toks(i), toks(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 &&
              ranks.getOrDefault((toks(j), toks(j + 1)), Int.MaxValue) == bestRank) {
            out += toks(j) + toks(j + 1); j += 2
          } else { out += toks(j); j += 1 }
        }
        toks = out.toArray
      }
    }
    if (memo.size < 65536) memo.put(w, toks)
    toks
  }

  override def nullSafeEval(t: Any, m: Any): Any = {
    ensureRanks(m.asInstanceOf[ArrayData])
    val s = t.asInstanceOf[UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var start = 0
    while (start <= s.length) {
      val sp = s.indexOf(' ', start)
      val end = if (sp < 0) s.length else sp
      if (end > start)
        encodeWord(s.substring(start, end)).foreach(tk => out += UTF8String.fromString(tk))
      start = end + 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(text = l, merges = r)
}
