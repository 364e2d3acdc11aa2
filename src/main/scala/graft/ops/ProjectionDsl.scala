package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Config-driven projection DSL — the graft analog of the reference's
 * `.properties`-driven field mappings and extraction specs
 * (classes/MarcRecord.php driver maps; classes/MappableMarcRecord.php:5-18
 * regex spec grammar, 52-120 evaluator): a compact text spec
 *
 *   out1=src[:fn[:arg]]; out2=src2[:fn]; ...
 *
 * is parsed ONCE into Catalyst column expressions — config in, declarative
 * plan out; every fn maps to a codegen'd built-in or a graft native
 * expression, so a DSL-projected scan is exactly as fast as a hand-written
 * select (nothing is interpreted per row).
 *
 * Supported fns: (none) = identity, lower, upper, ucfirst, normalize,
 * titleKey, host, year, substr:N, len.
 */
object ProjectionDsl {

  def parse(spec: String): Seq[Column] =
    spec.split(";").map(_.trim).filter(_.nonEmpty).toSeq.map { entry =>
      val Array(out, rhs) = entry.split("=", 2)
      val parts = rhs.trim.split(":").toList
      val src = col(parts.head.trim)
      val c = parts.tail match {
        case Nil => src
        case "lower" :: _ => lower(src)
        case "upper" :: _ => upper(src)
        case "ucfirst" :: _ =>
          concat(upper(substring(src, 1, 1)), src.substr(lit(2), length(src)))
        case "normalize" :: _ => graft.functions.normalization.normalizeText(src)
        case "titleKey" :: _ => graft.functions.normalization.titleKey(src)
        case "host" :: _ => regexp_extract(src, "^[a-z]+://([^/]+)", 1)
        case "year" :: _ => regexp_extract(src, "(-?\\d{4})", 1)
        case "substr" :: n :: _ => substring(src, 1, n.trim.toInt)
        case "len" :: _ => length(src).cast("long")
        case other :: _ =>
          throw new IllegalArgumentException(s"projection DSL: unknown fn '$other'")
      }
      c.as(out.trim)
    }

  def project(df: DataFrame, spec: String): DataFrame = df.select(parse(spec): _*)
}
