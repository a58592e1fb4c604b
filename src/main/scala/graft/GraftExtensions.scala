package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{CmsCounts, GramMatrix, GzipCompress, GzipDecompress, KmvMins, MinhashSigs, NfcNormalize, NormalizeText, PairStructs, QDist2, QDot, QuantizeMilli, RepetitionStats, SimhashFp, WinnowMins, TopKPairs, TopKPairsTagged}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions so they are callable from SQL in any session configured with
  * `spark.sql.extensions=graft.GraftExtensions` — the (c) rung of the
  * extension ladder (SURVEY §7.3): codegen'd Catalyst expressions, no UDF
  * registration required per session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("gzip_compress"),
      new ExpressionInfo(classOf[GzipCompress].getName, "gzip_compress"),
      (children: Seq[Expression]) => GzipCompress(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("gzip_decompress"),
      new ExpressionInfo(classOf[GzipDecompress].getName, "gzip_decompress"),
      (children: Seq[Expression]) => GzipDecompress(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("kmv_mins"),
      new ExpressionInfo(classOf[KmvMins].getName, "kmv_mins"),
      (children: Seq[Expression]) => KmvMins(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("vocab_mins"),
      new ExpressionInfo(classOf[graft.expressions.VocabMins].getName, "vocab_mins"),
      (children: Seq[Expression]) =>
        graft.expressions.VocabMins(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("cms_counts"),
      new ExpressionInfo(classOf[CmsCounts].getName, "cms_counts"),
      (children: Seq[Expression]) => {
        // explicit arity gate: lift(3) alone would silently DROP a 5th
        // argument, so a typo'd call builds a valid-looking sketch (r19
        // advice) — the other injected functions fail naturally via
        // positional access.
        if (children.length < 3 || children.length > 4)
          throw new IllegalArgumentException(
            s"cms_counts expects (hash, depth, width[, weight]), got ${children.length} arguments")
        CmsCounts(children(0), children(1), children(2), children.lift(3))
      }))
    ext.injectFunction((
      new FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      (children: Seq[Expression]) => RepetitionStats(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinhashSigs].getName, "minhash_sigs"),
      (children: Seq[Expression]) => MinhashSigs(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[SimhashFp].getName, "simhash_fp"),
      (children: Seq[Expression]) => SimhashFp(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("winnow_mins"),
      new ExpressionInfo(classOf[WinnowMins].getName, "winnow_mins"),
      (children: Seq[Expression]) => WinnowMins(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[graft.expressions.ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => graft.expressions.ShingleHashes(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("pair_structs"),
      new ExpressionInfo(classOf[PairStructs].getName, "pair_structs"),
      (children: Seq[Expression]) => PairStructs(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("topk_pairs"),
      new ExpressionInfo(classOf[TopKPairs].getName, "topk_pairs"),
      (children: Seq[Expression]) => TopKPairs(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("gram_matrix"),
      new ExpressionInfo(classOf[GramMatrix].getName, "gram_matrix"),
      (children: Seq[Expression]) => GramMatrix(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("qdot_q"),
      new ExpressionInfo(classOf[QDot].getName, "qdot_q"),
      (children: Seq[Expression]) => QDot(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("tokens_norm"),
      new ExpressionInfo(classOf[graft.expressions.TokensNorm].getName, "tokens_norm"),
      (children: Seq[Expression]) => graft.expressions.TokensNorm(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
      (children: Seq[Expression]) => NormalizeText(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("punct_count"),
      new ExpressionInfo(classOf[graft.expressions.PunctCount].getName, "punct_count"),
      (children: Seq[Expression]) => graft.expressions.PunctCount(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("quantize_milli"),
      new ExpressionInfo(classOf[QuantizeMilli].getName, "quantize_milli"),
      (children: Seq[Expression]) => QuantizeMilli(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("qdist2_q"),
      new ExpressionInfo(classOf[QDist2].getName, "qdist2_q"),
      (children: Seq[Expression]) => QDist2(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("count_in_sorted"),
      new ExpressionInfo(classOf[graft.expressions.CountInSorted].getName, "count_in_sorted"),
      (children: Seq[Expression]) => graft.expressions.CountInSorted(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("gram_counts"),
      new ExpressionInfo(classOf[graft.expressions.GramCounts].getName, "gram_counts"),
      (children: Seq[Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"gram_counts expects (tokens, mode), got ${children.length} arguments")
        graft.expressions.GramCounts(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("span_counts"),
      new ExpressionInfo(classOf[graft.expressions.SpanCounts].getName, "span_counts"),
      (children: Seq[Expression]) =>
        graft.expressions.SpanCounts(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("bpe_sym_count"),
      new ExpressionInfo(classOf[graft.expressions.BpeSymCount].getName, "bpe_sym_count"),
      (children: Seq[Expression]) =>
        graft.expressions.BpeSymCount(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("span_groups"),
      new ExpressionInfo(classOf[graft.expressions.SpanGroups].getName, "span_groups"),
      (children: Seq[Expression]) =>
        graft.expressions.SpanGroups(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("seg_groups"),
      new ExpressionInfo(classOf[graft.expressions.SegGroups].getName, "seg_groups"),
      (children: Seq[Expression]) =>
        graft.expressions.SegGroups(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("topk_pairs_tag"),
      new ExpressionInfo(classOf[TopKPairsTagged].getName, "topk_pairs_tag"),
      (children: Seq[Expression]) => TopKPairsTagged(children(0), children(1), children(2),
        children(3))))
  }
}
