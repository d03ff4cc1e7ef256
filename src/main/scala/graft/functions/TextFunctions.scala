package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Column-level scalar functions mirroring the reference's parsing /
 * normalization utilities (SURVEY.md §2.2) — all pure Catalyst expressions,
 * no UDFs, so they inline into whole-stage codegen.
 */
object TextFunctions {

  /**
   * Semicolon-line parser (reference: entityextractor/services/
   * openai_service.py:110-122): "name; type; url; citation" → struct, null
   * for malformed lines (< 4 fields — the reference drops them).
   */
  def parseEntityLine(line: Column): Column = {
    val parts = split(line, ";")
    when(size(parts) >= 4,
      struct(
        trim(element_at(parts, 1)).as("name"),
        trim(element_at(parts, 2)).as("entityType"),
        trim(element_at(parts, 3)).as("url"),
        trim(element_at(parts, 4)).as("citation")))
      .otherwise(lit(null).cast(
        "struct<name:string,entityType:string,url:string,citation:string>"))
  }

  /** Triple-line parser with JSON-array fallback (reference:
   * relationship_inference.py:377-398): try a JSON array of
   * {subject,predicate,object} first, else semicolon lines. */
  def parseTripleJson(payload: Column): Column =
    from_json(payload, ArrayType(StructType(Seq(
      StructField("subject", StringType),
      StructField("predicate", StringType),
      StructField("object", StringType)))))

  def parseTripleLine(line: Column): Column = {
    val parts = split(line, ";")
    when(size(parts) >= 3,
      struct(
        trim(element_at(parts, 1)).as("subject"),
        trim(element_at(parts, 2)).as("predicate"),
        trim(element_at(parts, 3)).as("object")))
      .otherwise(lit(null).cast("struct<subject:string,predicate:string,object:string>"))
  }

  /** Markdown fence stripper + control-char cleaner (reference:
   * entityextractor/utils/text_utils.py:9-56). */
  def cleanText(c: Column): Column =
    regexp_replace(regexp_replace(c, "```[a-zA-Z]*", ""), "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", "")

  /** Wikipedia URL validator (reference: text_utils.py:58-69). */
  def isValidWikipediaUrl(url: Column): Column =
    url.rlike("^https?://[a-z]{2}\\.wikipedia\\.org/wiki/[\\w\\-%]+")

  /** Trailing-ellipsis strip (reference: text_utils.py:71-86). */
  def stripEllipsis(c: Column): Column =
    rtrim(regexp_replace(c, "(\\.{3,}|…)\\s*$", ""))

  /** Defensive percent-decode: url_decode THROWS on a malformed escape
   * (e.g. a literal '%' not followed by two hex digits — "100%_club"),
   * which would fail the whole job on one bad row of untrusted input;
   * try_url_decode returns NULL there, and we fall back to the raw text. */
  private def safeUrlDecode(c: Column): Column =
    coalesce(call_function("try_url_decode", c), c)

  /** URL → title projection: path segment after /wiki/, fragment dropped,
   * percent-decoded, underscores to spaces (reference:
   * wikipedia_service.py:295-300). */
  def urlToTitle(url: Column): Column =
    replace(
      safeUrlDecode(regexp_extract(url, "/wiki/([^#?]+)", 1)),
      lit("_"), lit(" "))

  /** Language-from-URL projection (reference: wikipedia_service.py:306-314). */
  def langFromUrl(url: Column): Column =
    regexp_extract(url, "^https?://([a-z]{2})\\.", 1)

  /** inferred-flag normalizer: de/en spellings of "explicit" map to explicit,
   * everything else to implicit (reference: response_formatter.py:22-46). */
  def normalizeInferred(c: Column): Column =
    when(lower(c).isin("explizit", "explicit"), "explicit").otherwise("implicit")

  /** Wikidata time-string trim: "+1994-01-01T00:00:00Z" → "1994-01-01"
   * (reference: wikidata_service.py:506-513). */
  def trimWikidataTime(c: Column): Column =
    regexp_extract(c, "^\\+?(\\d{4}-\\d{2}-\\d{2})", 1)

  /** Citation span locator: 0-based [start, end) of the first occurrence of
   * `citation` in `content`, null when absent (reference:
   * orchestrator.py:80-88). */
  def citationSpan(content: Column, citation: Column): Column = {
    val pos1 = call_function("locate", citation, content) // 1-based, 0 = absent
    when(pos1 > 0,
      struct((pos1 - 1).as("start"), (pos1 - 1 + length(citation)).as("end")))
      .otherwise(lit(null).cast("struct<start:int,end:int>"))
  }

  /** Search-query normalization: percent-decode, underscores to spaces,
   * parens stripped (reference: wikipedia_service.py:140-147). */
  def normalizeQuery(c: Column): Column =
    trim(regexp_replace(replace(safeUrlDecode(c), lit("_"), lit(" ")), "[()]", ""))

  /** Column-level mirror of the driver-side EntityUniverse.norm (lowercase,
   * underscores → spaces, parens stripped, trimmed). EVERY join against a
   * norm-keyed table (the DBpedia Lookup fallback, the alias index) must
   * apply THIS on the probe side — `lower()` alone silently misses titles
   * like "Group (mathematics)" (round-2 ADVICE). */
  def labelNorm(c: Column): Column =
    trim(regexp_replace(replace(lower(c), lit("_"), lit(" ")), "[()]", ""))

  /**
   * URL sanitizer (reference: entityextractor/utils/wiki_url_utils.py:3-14):
   * percent-encode ONLY the title part after the first "/wiki/", spaces to
   * underscores first, keeping `_()%-` (and the always-safe alphanumerics,
   * `.`, `~`) unencoded — the semantics of Python's
   * `urllib.parse.quote(title, safe="_()%-")`.
   *
   * Built on `url_encode` (java.net.URLEncoder) with a post-fix chain for
   * the four characters where URLEncoder and quote() disagree:
   * `( ) ~` stay literal, `%` stays literal (no double-encoding of existing
   * escapes), `*` must be encoded. No spaces survive to the encoder, so the
   * '+'-for-space difference never arises.
   */
  def sanitizeWikipediaUrl(url: Column): Column = {
    val base = substring_index(url, "/wiki/", 1)
    val title = regexp_extract(url, "/wiki/(.*)$", 1)
    val enc = url_encode(replace(title, lit(" "), lit("_")))
    val fixed = replace(replace(replace(replace(replace(
      enc,
      lit("%28"), lit("(")), lit("%29"), lit(")")),
      lit("%7E"), lit("~")), lit("%25"), lit("%")), lit("*"), lit("%2A"))
    when(url.contains("/wiki/"), concat(base, lit("/wiki/"), fixed)).otherwise(url)
  }
}
