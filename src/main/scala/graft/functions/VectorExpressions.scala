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

  /** ColBERT-style late-interaction (MaxSim) score between two
    * multi-token embedding matrices, each flattened into one
    * array<double> of `nTokens * tokenDim` (token i occupies slots
    * [i*tokenDim, (i+1)*tokenDim)). Score =
    * Σ_{query tokens i} max_{candidate tokens j} floor(cos(q_i, c_j) * 1e6)
    * as LONG — every term is the floor-scaled integer micro-cosine, so
    * the sum is order-independent and a SQL oracle replays it exactly
    * (the same dot/norm arithmetic as DotScaledLong: per-element
    * floor(x*y*1e12) longs, sqrt of the scaled self-dot).
    *
    * Zero-norm tokens are skipped on both sides (a query token with no
    * valid candidate token contributes 0), mirroring the oracle's
    * `WHERE tnrm > 0` token filter. One tight codegen'd loop per
    * (query, candidate) pair replaces the exploded-token shuffle a
    * dataframe formulation would need: the pair row count stays at
    * |candidates|, not |candidates| * nTokens^2.
    *
    * Reference semantics: late-interaction scoring as in ColBERT
    * (Khattab & Zaharia, SIGIR 2020); the reference engine has no CEP
    * equivalent — this is part of the training-data/retrieval family.
    */
  case class MaxSimMicroLong(left: Expression, right: Expression, tokenDim: Int)
      extends BinaryExpression {
    override def dataType: DataType = LongType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val q = a.asInstanceOf[ArrayData]
      val c = b.asInstanceOf[ArrayData]
      val w = tokenDim
      val nq = q.numElements() / w
      val nc = c.numElements() / w
      // candidate token norms once per pair
      val cn = new Array[Double](nc)
      var j = 0
      while (j < nc) {
        var s = 0L
        var d = 0
        while (d < w) {
          val x = c.getDouble(j * w + d)
          s += math.floor(x * x * 1e12).toLong
          d += 1
        }
        cn(j) = math.sqrt(s / 1e12)
        j += 1
      }
      var acc = 0L
      var i = 0
      while (i < nq) {
        var qs = 0L
        var d = 0
        while (d < w) {
          val x = q.getDouble(i * w + d)
          qs += math.floor(x * x * 1e12).toLong
          d += 1
        }
        val qn = math.sqrt(qs / 1e12)
        if (qn != 0.0) {
          var best = Long.MinValue
          var found = false
          j = 0
          while (j < nc) {
            if (cn(j) != 0.0) {
              var dot = 0L
              d = 0
              while (d < w) {
                dot += math.floor(q.getDouble(i * w + d) * c.getDouble(j * w + d) * 1e12).toLong
                d += 1
              }
              val micro = math.floor(dot / 1e12 / (qn * cn(j)) * 1e6).toLong
              if (!found || micro > best) { best = micro; found = true }
            }
            j += 1
          }
          if (found) acc += best
        }
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val w = tokenDim
        val nq = ctx.freshName("nq"); val nc = ctx.freshName("nc")
        val cn = ctx.freshName("cn"); val i = ctx.freshName("i")
        val j = ctx.freshName("j"); val d = ctx.freshName("d")
        val s = ctx.freshName("s"); val qn = ctx.freshName("qn")
        val x = ctx.freshName("x"); val dot = ctx.freshName("dot")
        val best = ctx.freshName("best"); val found = ctx.freshName("found")
        val micro = ctx.freshName("micro"); val acc = ctx.freshName("acc")
        s"""
           |int $nq = $a.numElements() / $w;
           |int $nc = $b.numElements() / $w;
           |double[] $cn = new double[$nc];
           |for (int $j = 0; $j < $nc; $j++) {
           |  long $s = 0L;
           |  for (int $d = 0; $d < $w; $d++) {
           |    double $x = $b.getDouble($j * $w + $d);
           |    $s += (long) Math.floor($x * $x * 1e12);
           |  }
           |  $cn[$j] = Math.sqrt($s / 1e12);
           |}
           |long $acc = 0L;
           |for (int $i = 0; $i < $nq; $i++) {
           |  long $s = 0L;
           |  for (int $d = 0; $d < $w; $d++) {
           |    double $x = $a.getDouble($i * $w + $d);
           |    $s += (long) Math.floor($x * $x * 1e12);
           |  }
           |  double $qn = Math.sqrt($s / 1e12);
           |  if ($qn != 0.0) {
           |    long $best = Long.MIN_VALUE;
           |    boolean $found = false;
           |    for (int $j = 0; $j < $nc; $j++) {
           |      if ($cn[$j] != 0.0) {
           |        long $dot = 0L;
           |        for (int $d = 0; $d < $w; $d++) {
           |          $dot += (long) Math.floor(
           |            $a.getDouble($i * $w + $d) * $b.getDouble($j * $w + $d) * 1e12);
           |        }
           |        long $micro = (long) Math.floor($dot / 1e12 / ($qn * $cn[$j]) * 1e6);
           |        if (!$found || $micro > $best) { $best = $micro; $found = true; }
           |      }
           |    }
           |    if ($found) $acc += $best;
           |  }
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): MaxSimMicroLong =
      copy(l, r)
    override def prettyName: String = "max_sim_micro"
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Scaled-long dot product of two array<double> columns. */
  def dot_scaled(a: Column, b: Column): Column =
    column(DotScaledLong(expression(a), expression(b)))

  /** Late-interaction MaxSim micro-score (see MaxSimMicroLong). */
  def max_sim_micro(q: Column, c: Column, tokenDim: Int): Column =
    column(MaxSimMicroLong(expression(q), expression(c), tokenDim))

  /** SRP-LSH bucket id of an array<double> column (see SrpBucketLong). */
  def srp_bucket(v: Column, nbits: Int): Column =
    column(SrpBucketLong(expression(v), nbits))
}
