package graft.prep

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction, the step between WARC ingest and every text
  * operator in the curation chain (what CommonCrawl distributes as WET
  * files): crawls deliver markup, the LM pipeline wants prose.
  *
  * Deliberately a REGEX pipeline over pure `Column` functions — no UDF,
  * no external parser — so the whole extraction stays inside whole-stage
  * codegen and is expressible verbatim in the DuckDB twin (the oracle
  * hashes the extracted text, not a summary of it). The transform is the
  * boilerplate-strip a corpus pass actually runs:
  *
  *   1. drop `<script>`/`<style>` elements WITH their contents (code and
  *      CSS are not prose; regex alternation, not backreferences — RE2,
  *      DuckDB's engine, has none);
  *   2. drop comments, then ALL remaining tags, each leaving one space
  *      (so `</p><p>` never glues two words together);
  *   3. decode the named entities markup emits for reserved characters
  *      (`&lt; &gt; &quot; &#39; &nbsp;`, and `&amp;` strictly LAST —
  *      decoding it earlier would double-decode `&amp;lt;`);
  *   4. collapse whitespace runs to single spaces and trim.
  *
  * Stated limits (the honest subset, like x16's regex PII): numeric
  * character references beyond `&#39;` and exotic named entities pass
  * through untouched, and pathological markup degrades predictably —
  * an UNCLOSED `<script>` has no element to match, so its code LEAKS
  * into the text (only its tags strip); a boilerplate-quality gate
  * downstream (x2/x23) is what catches those rows, the same division
  * of labor real WET pipelines use. A scale pass runs this as a narrow
  * row-local projection: no shuffle, scan-speed, composes directly with
  * `decode(payload, 'UTF-8')` off [[graft.sources.Warc]] records.
  */
object Html {

  /** Extracted prose of an HTML string column. */
  def textOf(c: Column): Column = {
    val noScript = regexp_replace(c,
      "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val ent = List(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&" // amp LAST
    ).foldLeft(noTags) { case (col, (from, to)) =>
      replace(col, lit(from), lit(to))
    }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** The DuckDB twin of [[textOf]] over SQL expression `e` — single
    * source of truth for every oracle that extracts text from markup. */
  def textOfSql(e: String): String = {
    val noScript =
      s"regexp_replace($e, '<script[^>]*>.*?</script>|<style[^>]*>.*?</style>', ' ', 'gis')"
    val noComment = s"regexp_replace($noScript, '<!--.*?-->', ' ', 'gs')"
    val noTags = s"regexp_replace($noComment, '<[^>]+>', ' ', 'g')"
    val ent = List("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (sql, (from, to)) =>
        s"replace($sql, '$from', '$to')"
      }
    s"trim(regexp_replace($ent, '\\s+', ' ', 'g'))"
  }

  /** HTML-escape of a text column — the fixture-builder inverse (reserved
    * characters only, `&` strictly FIRST), mirrored by [[escapeSql]]. */
  def escape(c: Column): Column =
    List("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;")
      .foldLeft(c) { case (col, (from, to)) => replace(col, lit(from), lit(to)) }

  def escapeSql(e: String): String =
    List("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;")
      .foldLeft(e) { case (sql, (from, to)) => s"replace($sql, '$from', '$to')" }
}
