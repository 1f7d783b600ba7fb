package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[RollingHash]] — called from generated code, so it
  * must be a stable public object method. */
object RollingHashUtil {
  /** Polynomial rolling hash over Unicode code points (base 1000003,
    * wrapping i64). Used for document fingerprinting: content-defined,
    * order-sensitive, cheap enough to run inline in a scan at 100 TB (no
    * shuffle, no UDF boxing — this is a codegen'd Catalyst expression).
    * Code points, not UTF-8 bytes, so any engine with a codepoint split can
    * reproduce it exactly (the DuckDB oracle folds the same sequence through
    * HUGEINT arithmetic mod 2^64). */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = h * 1000003L + cp
      i += Character.charCount(cp)
    }
    h
  }
}

/** Codegen'd document-fingerprint expression (SURVEY §7.5 beyond-parity:
  * text analysis / document fingerprinting). Prefer this over a Scala UDF:
  * it participates in whole-stage codegen (no SerDe, no boxing).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    RollingHashUtil.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.RollingHashUtil.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Runtime helper for [[MinHashSigs]] — stable public entry point for
  * generated code. */
object MinHashUtil {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  /** K seeded-XXH64 min-hashes over a shingle array in ONE pass. The
    * higher-order-function formulation (`transform(sequence(0,K-1), k ->
    * array_min(transform(sh, s -> xxhash64(concat(k, ':', s)))))`) walks the
    * array K times and allocates a concatenated string per (seed, shingle);
    * this walks once, hashes the raw UTF-8 bytes with the seed, and
    * allocates only the K-element result — the "native Expression beats the
    * HOF chain" case for the 100 TB scan path. */
  def sigs(arr: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      var j = 0
      while (j < k) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, j)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Codegen'd MinHash signature: `minhash_sigs(shingles, K)` -> array<long>
  * of the K per-seed minima. */
case class MinHashSigs(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "minhash_sigs needs k > 0")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    MinHashUtil.sigs(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.MinHashUtil.sigs($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

/** Runtime helper for [[SimHashSig]] — stable public entry point for
  * generated code. */
object SimHashUtil {
  import org.apache.spark.sql.catalyst.util.ArrayData

  /** 60-bit SimHash from pre-hashed shingles in one tight pass. The HOF
    * formulation (`aggregate(hashes, array_repeat(0L, 60), (acc, h) ->
    * zip_with(acc, sequence(0, 59), ...))`) allocates a fresh 60-element
    * array per shingle and runs 60 interpreted lambdas per element; this
    * keeps one int[60] of votes and loops — measured 7.7 s -> sub-second
    * for the sf0.1 signature pass. Bit j is set when strictly more than
    * half the hashes have bit j set (votes > 0), matching the oracle's
    * `2 * count_set > n` formulation. */
  def sig(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var acc = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) acc |= (1L << j)
      j += 1
    }
    acc
  }
}

/** Codegen'd SimHash signature: `simhash_sig(hashes)` -> 60-bit long. */
case class SimHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    SimHashUtil.sig(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.SimHashUtil.sig($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

/** Runtime helper for [[ArrayDot]] / [[ArrayCosine]] — stable public entry
  * points for generated code. */
object ArrayDotUtil {
  import org.apache.spark.sql.catalyst.util.ArrayData

  @inline private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Sequential left-fold dot product — bit-identical to
    * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +)` (same element order,
    * same double adds, float widened exactly, NULL on length mismatch or a
    * null element — zip_with pads with null and null poisons the fold) but
    * ONE pass with zero array allocations, vs the HOF chain's zipped +
    * transformed intermediates. The ANN scan path at 100 TB runs this once
    * per (query, candidate). Returns a boxed Double (null = SQL NULL). */
  def dot(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elem(a, i, af) * elem(b, i, bf)
      i += 1
    }
    acc
  }

  /** Cosine in one pass: three independent accumulators, each equal to its
    * own sequential fold, so the result is bit-identical to
    * dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b))) composed from HOFs (including
    * the NULL cases). */
  def cos(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elem(a, i, af)
      val y = elem(b, i, bf)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Shared shape of the two one-pass array similarity expressions: strict
  * array<float|double> inputs (analysis error otherwise — a loose getDouble
  * over an int-backed array would read garbage), nullable result (NULL on
  * null input, null element, or length mismatch — the HOF fold's
  * semantics). */
trait ArrayPairExpression
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  protected def fn: String
  protected def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn expects two array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""java.lang.Double $r =
         |  graft.ArrayDotUtil.$fn($a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })
}

/** Codegen'd `array_dot(a, b)` over array<float|double> columns. */
case class ArrayDot(left: Expression, right: Expression) extends ArrayPairExpression {
  override protected def fn: String = "dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotUtil.dot(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      isFloat(left), isFloat(right))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(left = l, right = r)
}

/** Codegen'd `array_cos(a, b)` — one-pass cosine similarity. */
case class ArrayCosine(left: Expression, right: Expression) extends ArrayPairExpression {
  override protected def fn: String = "cos"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotUtil.cos(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      isFloat(left), isFloat(right))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayCosine =
    copy(left = l, right = r)
}

/** Runtime helper for [[JsonNormalize]]. */
object JsonNormalizeUtil {
  private val om = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.configure(
      com.fasterxml.jackson.databind.SerializationFeature.ORDER_MAP_ENTRIES_BY_KEYS, true)
    m
  }

  /** Re-render a JSON document compact with recursively sorted object keys —
    * the reference's rendering for every COMPUTED json value: DuckDB JSON
    * results are scanned into `interface{}` and emitted through Go's
    * `json.Marshal`, which sorts map keys and strips whitespace
    * (response_handler.go:317-327). Stored json/jsonb columns bypass this
    * (they are VARCHAR passthrough). Invalid JSON passes through unchanged. */
  def norm(s: UTF8String): UTF8String = {
    if (s == null) return null
    try {
      val tree = om.readTree(s.toString)
      UTF8String.fromString(
        om.writeValueAsString(om.treeToValue(tree, classOf[Object])))
    } catch { case _: Exception => s }
  }
}

/** `jsonb_norm(x)` — Go-marshal-equivalent JSON normalization, applied by
  * the dialect to `::json[b]` casts and json_build_object results. */
case class JsonNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override protected def nullSafeEval(input: Any): Any =
    JsonNormalizeUtil.norm(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.JsonNormalizeUtil.norm($c)")
  override protected def withNewChildInternal(newChild: Expression): JsonNormalize =
    copy(child = newChild)
}

/** Explode of an array<string> whose output field carries metadata — used
  * by json[b]_array_elements so the produced `value` column advertises the
  * JSON wire-type OID like the reference's DuckDB json_each surface
  * (query_remapper_table.go:113-134). Semantics identical to Explode. */
case class ExplodeTagged(child: Expression, fieldName: String,
    meta: org.apache.spark.sql.types.Metadata)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.{ArrayType, StringType, StructType}

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array<string> input expected, got $other")
    }

  override def elementSchema: StructType =
    new StructType().add(fieldName, StringType, nullable = true, meta)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val arr = child.eval(input)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (arr == null) Nil
    else (0 until arr.numElements()).map(i =>
      org.apache.spark.sql.catalyst.InternalRow(arr.get(i, StringType)))
  }

  override protected def withNewChildInternal(newChild: Expression): ExplodeTagged =
    copy(child = newChild)
}

object GraftExpressions {
  /** Column form; requires register(spark) to have run in the session. */
  def rolling_hash(c: Column): Column =
    org.apache.spark.sql.functions.call_function("rolling_hash", c)

  def minhash_sigs(c: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "minhash_sigs", c, org.apache.spark.sql.functions.lit(k))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs", exprs => MinHashSigs(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jsonb_norm", exprs =>
        org.apache.spark.sql.catalyst.expressions.Alias(
          JsonNormalize(exprs.head), "jsonb_norm")(
          explicitMetadata = Some(PgFunctions.jsonValMeta)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_sig", exprs => SimHashSig(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => ArrayDot(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_cos", exprs => ArrayCosine(exprs.head, exprs(1)), "scala_udf")
    // Spark's own runtime-filter bloom expressions (catalyst internal,
    // public classfile API): a DISTRIBUTED bloom build (map-side combined
    // aggregate) + a codegen'd membership probe over xxhash64 — what the
    // optimizer injects for runtime row-group filtering, exposed here for
    // explicit probe-set prefilters (txt_bloom_decontaminate)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg", exprs =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(exprs.head)),
          exprs(1).eval().asInstanceOf[Number].longValue)
          .toAggregateExpression(), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain", exprs =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs.head,
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(exprs(1)))),
      "scala_udf")
  }
}
