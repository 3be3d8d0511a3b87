package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Entity + temporal extraction-as-columns — the rebuilt FEEDERS of the
  * EAV store (the store itself is [[graft.operators.PostStore]]): the
  * reference extracts emails and patent numbers from page text
  * (`crawler/extractors/extractor.py:103-108` extract_email, `:110-115`
  * extract_patent → `et_email`/`et_patent` EAV fields) and normalizes
  * textual long-month dates to its ISO storage format
  * (`crawler/connectors/amazonconnector.py:244-249`: `'%B %d, %Y'` →
  * `%Y-%m-%dT%H:%M:%SZ`; the NLP temporal-phrase path
  * `extractor.py:175-204` is out of scope per the north rule — external
  * NLP stack — but its date-normalization output shape is this one).
  *
  * Every function here is a pure codegen'd regexp/date expression — no
  * UDF, fuses with the scan, zero shuffle: the right 100 TB shape for
  * per-row extraction.
  */
object EntityExtract {

  /** The reference's email pattern (`extractor.py:104`), restated
    * without the redundant group nesting (RE2-compatible, so the SQL
    * oracle states it verbatim): local part of word/dot/dash/plus
    * chars, one or more dotted labels, 2-4 char TLD.
    */
  val EmailRe: String =
    "[a-zA-Z0-9_.+-]+@(?:[a-zA-Z0-9-]+\\.)+[a-zA-Z0-9]{2,4}"

  /** Patent-number mentions (`extractor.py:111`, which captures the
    * number group after a case-insensitive "patent" cue — the
    * reference regex's backtracking constructs are restated in the
    * RE2-safe equivalent): optional "no." filler, optional 2-letter
    * country prefix, digits with comma/period thousands separators.
    * Group 1 is the patent number.
    */
  val PatentRe: String =
    "(?i)patent[ \\t]*(?:no\\.?[ \\t]*)?((?:[A-Z]{2} ?)?[0-9][0-9,.]*[0-9])"

  val MonthNames: Seq[String] = Seq(
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December")

  /** `'%B %d, %Y'` textual dates ("January 15, 2024"). */
  val TextualDateRe: String =
    s"(${MonthNames.mkString("|")}) ([0-9]{1,2}), ([0-9]{4})"

  /** ALL email addresses in `text`, in order of appearance. */
  def emails(text: Column): Column =
    regexp_extract_all(text, lit(EmailRe), lit(0))

  /** ALL patent numbers in `text` (the captured number group only,
    * like the reference's `match[2]`).
    */
  def patents(text: Column): Column =
    regexp_extract_all(text, lit(PatentRe), lit(1))

  /** First long-month textual date in `text`, normalized to the
    * reference's posted_date storage format `%Y-%m-%dT%H:%M:%SZ`
    * (`amazonconnector.py:244-249`); null when absent or unparseable
    * (`try_to_timestamp`, so a "February 30" in the wild degrades to
    * null instead of an ANSI error — the reference's try/except
    * fallback path).
    */
  def textualDateIso(text: Column): Column = {
    val m = regexp_extract(text, TextualDateRe, 0)
    when(length(m) > 0,
      date_format(try_to_timestamp(m, lit("MMMM d, yyyy")),
        "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .otherwise(lit(null).cast("string"))
  }

  /** Same first textual date as a plain `yyyy-MM-dd` string — the form
    * [[graft.operators.PostStore.eavExplode]] parses for `edate_`
    * fields.
    */
  def textualDateDay(text: Column): Column = {
    val m = regexp_extract(text, TextualDateRe, 0)
    when(length(m) > 0,
      date_format(try_to_timestamp(m, lit("MMMM d, yyyy")), "yyyy-MM-dd"))
      .otherwise(lit(null).cast("string"))
  }

  /** The extracted entities as the EAV map the reference's page dict
    * carries (`baseconnector.py:896-928` consumes exactly this shape):
    * `et_email` / `et_patent` (comma-joined text) and `edate_posted`
    * (day-precision date string). Feed through
    * [[graft.operators.PostStore.eavStoreMap]] for storage typing and
    * truncation. Absent extractions store as empty string / null value
    * entries are dropped (map_filter) so the store never carries
    * null-valued fields.
    */
  def entitiesMap(text: Column): Column =
    map_filter(
      map(
        lit("et_email"), array_join(emails(text), ","),
        lit("et_patent"), array_join(patents(text), ","),
        lit("edate_posted"), textualDateDay(text)),
      (_, v) => v.isNotNull && length(v) > 0)
}
