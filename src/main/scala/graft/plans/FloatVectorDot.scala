package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>` columns.
  *
  * The built-in composition (`aggregate(zip_with(...))`) materializes
  * an intermediate array per row and walks it through generic
  * HigherOrderFunction machinery; for N²-pair similarity workloads
  * that allocation dominates. This expression compiles to a tight
  * primitive loop inside whole-stage codegen — no allocation, no
  * boxing — and keeps the exact same numeric contract as the lambda
  * form (cast each float to double, multiply, accumulate
  * left-to-right), so results are bit-identical and oracle-stable.
  */
case class FloatVectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_fvdot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration: as a `SparkSessionExtensions` injection (for
  * `spark.sql.extensions=graft.plans.GraftExtensions`) and as an
  * idempotent runtime registrar for sessions built without the
  * config. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.fvdotDescriptor)
    ext.injectFunction(GraftFunctions.gramsDescriptor)
    ext.injectFunction(GraftFunctions.entropyDescriptor)
    ext.injectFunction(GraftFunctions.winnowDescriptor)
    ext.injectFunction(GraftFunctions.dsirCountsDescriptor)
    ext.injectFunction(GraftFunctions.dsirScoreDescriptor)
    ext.injectFunction(GraftFunctions.hashEmbedDescriptor)
    ext.injectFunction(GraftFunctions.minhashDescriptor)
    ext.injectFunction(GraftFunctions.simhashDescriptor)
    ext.injectFunction(GraftFunctions.urlPctDescriptor)
    ext.injectFunction(GraftFunctions.urlQsortDescriptor)
    ext.injectFunction(GraftFunctions.urlDotFoldDescriptor)
    ext.injectOptimizerRule(_ => RewriteVectorDot)
  }
}

object GraftFunctions {
  val fvdotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_fvdot"),
    new ExpressionInfo(classOf[FloatVectorDot].getName, "graft_fvdot"),
    (children: Seq[Expression]) => FloatVectorDot(children(0), children(1)))

  val gramsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_grams"),
    new ExpressionInfo(classOf[RollingGramHash].getName, "graft_grams"),
    mkGrams _)

  // the window size parameterizes generated code, so it must be a
  // compile-time literal, not a runtime column
  private def mkGrams(children: Seq[Expression]): Expression = children(1) match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
      RollingGramHash(children(0), v)
    case other => throw new IllegalArgumentException(
      s"graft_grams(tokens, k): k must be an integer literal, got $other")
  }

  val winnowDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_winnow"),
    new ExpressionInfo(classOf[WinnowSelect].getName, "graft_winnow"),
    mkWinnow _)

  // the window size parameterizes generated code, so it must be a
  // compile-time literal, not a runtime column
  private def mkWinnow(children: Seq[Expression]): Expression = children(1) match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
      WinnowSelect(children(0), v)
    case other => throw new IllegalArgumentException(
      s"graft_winnow(hashes, w): w must be an integer literal, got $other")
  }

  val dsirCountsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dsir_counts"),
    new ExpressionInfo(classOf[DsirBucketCounts].getName, "graft_dsir_counts"),
    mkDsirCounts _)

  // the bucket count sizes the aggregation buffer, so it must be a
  // compile-time literal, not a runtime column
  private def mkDsirCounts(children: Seq[Expression]): Expression = children(2) match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
      DsirBucketCounts(children(0), children(1), v)
    case other => throw new IllegalArgumentException(
      s"graft_dsir_counts(text, is_target, buckets): buckets must be an integer literal, got $other")
  }

  val dsirScoreDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dsir_score"),
    new ExpressionInfo(classOf[DsirScore].getName, "graft_dsir_score"),
    mkDsirScore _)

  // the fitted model rides as a foldable array literal (the
  // BloomSemiJoin bounded-artifact pattern), indexed by bucket
  private def mkDsirScore(children: Seq[Expression]): Expression = children(1) match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        a: org.apache.spark.sql.catalyst.util.ArrayData,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, _)) =>
      DsirScore(children(0), a.toLongArray())
    case other => throw new IllegalArgumentException(
      s"graft_dsir_score(text, llr): llr must be an array<long> literal, got $other")
  }

  val hashEmbedDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hash_embed"),
    new ExpressionInfo(classOf[HashEmbed].getName, "graft_hash_embed"),
    mkHashEmbed _)

  // the dimension count sizes the per-row accumulator, so it must be
  // a compile-time literal, not a runtime column
  private def mkHashEmbed(children: Seq[Expression]): Expression = children(1) match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
      HashEmbed(children(0), v)
    case other => throw new IllegalArgumentException(
      s"graft_hash_embed(text, dims): dims must be an integer literal, got $other")
  }

  val minhashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
    mkMinhash _)

  // the shingle width parameterizes the window walk, so it must be a
  // compile-time literal, not a runtime column
  private def mkMinhash(children: Seq[Expression]): Expression = children(1) match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
      MinHashSig(children(0), v)
    case other => throw new IllegalArgumentException(
      s"graft_minhash(text, n): n must be an integer literal, got $other")
  }

  val simhashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimHashFp].getName, "graft_simhash"),
    mkSimhash _)

  // the bit width sizes the vote array, so it must be a compile-time
  // literal, not a runtime column
  private def mkSimhash(children: Seq[Expression]): Expression = children(1) match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
      SimHashFp(children(0), v)
    case other => throw new IllegalArgumentException(
      s"graft_simhash(text, bits): bits must be an integer literal, got $other")
  }

  val htmlExtractDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_html_extract"),
    new ExpressionInfo(classOf[HtmlExtract].getName, "graft_html_extract"),
    mkHtmlExtract _)

  // the keep thresholds parameterize generated code, so they must be
  // compile-time literals, not runtime columns
  private def mkHtmlExtract(children: Seq[Expression]): Expression =
    (children(1), children(2)) match {
      case (org.apache.spark.sql.catalyst.expressions.Literal(mt: Int, _),
            org.apache.spark.sql.catalyst.expressions.Literal(inv: Int, _)) =>
        HtmlExtract(children(0), mt, inv)
      case other => throw new IllegalArgumentException(
        s"graft_html_extract(html, min_tokens, density_inv): thresholds " +
          s"must be integer literals, got $other")
    }

  val urlPctDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_url_pct"),
    new ExpressionInfo(classOf[UrlPercentNorm].getName, "graft_url_pct"),
    (children: Seq[Expression]) => UrlPercentNorm(children(0)))

  val urlQsortDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_url_qsort"),
    new ExpressionInfo(classOf[UrlQuerySort].getName, "graft_url_qsort"),
    (children: Seq[Expression]) => UrlQuerySort(children(0)))

  val urlDotFoldDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_url_dotfold"),
    new ExpressionInfo(classOf[UrlDotFold].getName, "graft_url_dotfold"),
    (children: Seq[Expression]) => UrlDotFold(children(0)))

  val urlCanonDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_url_canon"),
    new ExpressionInfo(classOf[UrlCanon].getName, "graft_url_canon"),
    (children: Seq[Expression]) => UrlCanon(children(0)))

  val prophetSolveDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_prophet_solve"),
    new ExpressionInfo(classOf[ProphetSolve].getName, "graft_prophet_solve"),
    (children: Seq[Expression]) => ProphetSolve(children(0)))

  val entropyDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_entropy"),
    new ExpressionInfo(classOf[TextEntropy].getName, "graft_entropy"),
    mkEntropy _)

  val repStatsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_rep_stats"),
    new ExpressionInfo(classOf[RepetitionStats].getName, "graft_rep_stats"),
    mkRepStats _)

  // the gram widths size the per-document passes, so they must be
  // array<int> literals, not runtime columns
  private def mkRepStats(children: Seq[Expression]): Expression =
    (children(1), children(2)) match {
      case (org.apache.spark.sql.catalyst.expressions.Literal(
              a: org.apache.spark.sql.catalyst.util.ArrayData,
              org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, _)),
            org.apache.spark.sql.catalyst.expressions.Literal(
              b: org.apache.spark.sql.catalyst.util.ArrayData,
              org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, _))) =>
        RepetitionStats(children(0), a.toIntArray().toSeq, b.toIntArray().toSeq)
      case other => throw new IllegalArgumentException(
        s"graft_rep_stats(tokens, top_ns, dup_ns): widths must be " +
          s"array<int> literals, got $other")
    }

  // the alphabet delimiter parameterizes the scan, so it must be a
  // string literal, not a runtime column
  private def mkEntropy(children: Seq[Expression]): Expression = children(1) match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
      TextEntropy(children(0), if (v == null) "" else v.toString)
    case other => throw new IllegalArgumentException(
      s"graft_entropy(text, delim): delim must be a string literal, got $other")
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fvdot", children => FloatVectorDot(children(0), children(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_grams", mkGrams, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_entropy", mkEntropy, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rep_stats", mkRepStats, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow", mkWinnow, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dsir_counts", mkDsirCounts, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dsir_score", mkDsirScore, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hash_embed", mkHashEmbed, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", mkMinhash, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", mkSimhash, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_html_extract", mkHtmlExtract, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_url_pct", cs => UrlPercentNorm(cs(0)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_url_qsort", cs => UrlQuerySort(cs(0)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_url_dotfold", cs => UrlDotFold(cs(0)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_url_canon", cs => UrlCanon(cs(0)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_prophet_solve", cs => ProphetSolve(cs(0)), "scala_udf")
    if (!spark.experimental.extraOptimizations.contains(RewriteVectorDot)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteVectorDot
    }
  }
}
