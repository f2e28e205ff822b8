package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.catalyst.{CosineSim, ImageDims, L2Sq, Mp4Meta, SortedIntersectCount, TokenizeStem, WinnowFingerprint}

/** Session-extension entry point — the deployment path for the engine's
  * native expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * installs every graft function into the session's catalog at build time,
  * so pure-SQL users (thrift server, notebooks, `spark.sql` pipelines)
  * reach them without any Scala import or per-session `register` call —
  * the same mechanism Delta/Iceberg use to add their SQL surface. The
  * per-object `register` helpers remain for ad-hoc sessions; this class is
  * the injected, cluster-wide form of the same builders.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // ExpressionInfo's 3-arg constructor is (className, db, NAME) — the
  // usage text needs the 5-arg (className, db, name, usage, arguments)
  private def fn(name: String, usage: String,
                 builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.catalyst", null, name, usage, ""),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two ARRAY<DOUBLE> vectors",
      exprs => CosineSim(exprs.head, exprs(1))))
    ext.injectFunction(fn("l2_sq",
      "l2_sq(a, b) - squared L2 distance of two ARRAY<DOUBLE> vectors",
      exprs => L2Sq(exprs.head, exprs(1))))
    ext.injectFunction(fn("tokenize_ru",
      "tokenize_ru(text) - T1 lexemes with light RU suffix stemming",
      exprs => TokenizeStem(exprs.head)))
    ext.injectFunction(fn("winnow_fingerprint",
      "winnow_fingerprint(text) - winnowing document fingerprints",
      exprs => WinnowFingerprint(exprs.head)))
    ext.injectFunction(fn("sorted_intersect_count",
      "sorted_intersect_count(a, b) - intersection size of two sorted-" +
        "distinct STRING arrays",
      exprs => SortedIntersectCount(exprs.head, exprs(1))))
    ext.injectFunction(fn("image_dims",
      "image_dims(bytes) - struct(format, width, height) parsed from " +
        "PNG/JPEG/GIF headers, NULL if not an image",
      exprs => ImageDims(exprs.head)))
    ext.injectFunction(fn("video_meta",
      "video_meta(bytes) - struct(brand, timescale, duration_ms) parsed " +
        "from an MP4 (ISO BMFF) header, NULL if not an MP4",
      exprs => Mp4Meta(exprs.head)))
    // txlog catalog tables read through the native parquet plan —
    // vectorized scan, whole-stage codegen, manifest pruning — instead of
    // the V1Scan row-conversion fallback
    ext.injectResolutionRule(graft.sources.v2.TxLogReadRule.apply)
    // range predicates on the derived epoch-nanos column regain parquet
    // row-group pruning on the casual read path (redundant pushable
    // bounds on the raw timestamp attribute; pre-CBO = runs once)
    ext.injectPreCBORule(graft.catalyst.EpochNanosPushdown.apply)
  }
}
