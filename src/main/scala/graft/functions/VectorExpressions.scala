package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native vector expressions — the hot path of similarity search.
  * A custom Catalyst expression with codegen beats both higher-order
  * function folds (interpreted) and exploded dimension-joins (shuffle +
  * hash-agg per pair): one tight loop per pair inside whole-stage
  * codegen.
  */
object VectorExpressions {

  /** Σ floor(a(i)*b(i) * 1e12) as LONG — an exact, order-independent
    * scaled dot product over two double arrays. Divide by 1e12 for the
    * double value; same formula is reproducible in SQL oracles
    * (sum(cast(floor((x*y)*1e12) as bigint))). Null if either side is
    * null; arrays must have equal length.
    */
  case class DotScaledLong(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      var i = 0
      var acc = 0L
      val n = x.numElements()
      while (i < n) {
        acc += math.floor(x.getDouble(i) * y.getDouble(i) * 1e12).toLong
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |long $acc = 0L;
           |int $n = $a.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += (long) Math.floor($a.getDouble($i) * $b.getDouble($i) * 1e12);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotScaledLong =
      copy(l, r)
    override def prettyName: String = "dot_scaled_long"
  }

  import org.apache.spark.sql.catalyst.expressions.UnaryExpression

  /** Sign-random-projection bucket id over an array<double> column:
    * `nbits` hyperplanes whose ±1 components come from a mixed
    * multiplicative hash of (bit, dim) — data-independent, and simple
    * integer arithmetic that a SQL oracle can recompute exactly
    * (unlike xxhash64). Projections accumulate floor(sign*x*1e12) as
    * LONG, so the bit decisions are exact and order-independent — the
    * same trick as DotScaledLong, making the whole bucket id
    * reproducible row-for-row in DuckDB.
    *
    * The sign hash is TWO multiply-xor-shift rounds, every
    * intermediate below 2^63 (DuckDB BIGINT errors on overflow, so the
    * second multiplicand is masked to 27 bits first):
    *   i  = b*64 + d + 1
    *   h1 = (i * 2654435761) mod 2^32;  h2 = h1 xor (h1 >> 16)
    *   h3 = ((h2 mod 2^27) * 1597334677) mod 2^32; h4 = h3 xor (h3 >> 16)
    *   sign = +1 if h4 & 1 else -1
    * A single multiplicative round (the first version) left the
    * hyperplane rows heavily CORRELATED — consecutive bits' sign
    * patterns agreed on up to 60/64 or as few as 2/64 dims, collapsing
    * the effective bit count and producing buckets of thousands at
    * corpus scale (measured: max bucket 5815 of 200k vectors at 15
    * bits; after the second round, max ~15 of 20k at 15 bits).
    *
    * One tight codegen loop per row replaces the nbits×dim
    * `when(pmod(xxhash64(...)))` expression forest the first version
    * built (which dominated te03's runtime via codegen blowup).
    */
  case class SrpBucketLong(child: Expression, nbits: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType

    private def sign(b: Int, d: Int): Double = {
      val i = (b * 64 + d + 1).toLong
      var h = (i * 2654435761L) & 0xFFFFFFFFL
      h ^= h >> 16
      h = ((h & ((1L << 27) - 1)) * 1597334677L) & 0xFFFFFFFFL
      h ^= h >> 16
      if ((h & 1L) == 1L) 1.0 else -1.0
    }

    // Flattened [nbits * dim] sign matrix, sized lazily to the first
    // row's dimensionality (embeddings are fixed-dim per column).
    @transient private lazy val signCache =
      new java.util.concurrent.atomic.AtomicReference[Array[Double]]()

    private def signs(dim: Int): Array[Double] = {
      // The (bit, dim) index uses a FIXED stride of 64 (mirrored by the
      // oracle CTEs), so dim > 64 would silently alias hyperplane b's
      // components [64..dim) onto hyperplane b+1's — reintroducing the
      // correlated-hyperplane tail-bucket defect. Fail loudly instead.
      require(dim <= 64,
        s"SrpBucketLong supports embedding dim <= 64 (stride of the " +
          s"(bit,dim) sign hash); got dim=$dim")
      val cached = signCache.get()
      if (cached != null && cached.length == nbits * dim) cached
      else {
        val m = Array.tabulate(nbits * dim)(i => sign(i / dim, i % dim))
        signCache.set(m)
        m
      }
    }

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val dim = x.numElements()
      val m = signs(dim)
      var bucket = 0L
      var b = 0
      while (b < nbits) {
        var acc = 0L
        var d = 0
        while (d < dim) {
          acc += math.floor(m(b * dim + d) * x.getDouble(d) * 1e12).toLong
          d += 1
        }
        if (acc >= 0L) bucket |= 1L << b
        b += 1
      }
      bucket
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("srp", this, classOf[SrpBucketLong].getName)
      nullSafeCodeGen(ctx, ev, a => {
        s"${ev.value} = (Long) $self.nullSafeEval($a);"
      })
    }

    override protected def withNewChildInternal(c: Expression): SrpBucketLong =
      copy(child = c)
    override def prettyName: String = "srp_bucket"
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Scaled-long dot product of two array<double> columns. */
  def dot_scaled(a: Column, b: Column): Column =
    column(DotScaledLong(expression(a), expression(b)))

  /** SRP-LSH bucket id of an array<double> column (see SrpBucketLong). */
  def srp_bucket(v: Column, nbits: Int): Column =
    column(SrpBucketLong(expression(v), nbits))
}
