package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S5: the search-engine metapage source (reference GoogleConnector,
  * crawler/connectors/googleconnector.py:42-120), re-expressed as a
  * declarative URL generator instead of a live paginating scraper:
  *
  *  - query terms = one per FILTER keyword prefixed to the instance's
  *    queryterm when `apply_keywords` is set (`_createUrl`,
  *    googleconnector.py:73-89), else the bare queryterm;
  *  - one metapage URL per term from the search template with the
  *    instance's result budget (default 100, the reference's fallback);
  *  - search metapages do NOT consume recursion depth (the reference
  *    decrements the level before expansion, googleconnector.py:105-107)
  *    — callers seed these URLs with `depthDelta = 0`.
  *
  * Everything is a built-in expression (explode + concat), so the
  * generator is oracle-checkable. Term encoding here covers the
  * space-only alphabet of task config terms; a live deployment swaps
  * in full RFC-3986 escaping (`url_encode`) at the marked column.
  */
object SearchSource {

  val DefaultNumResults = 100 // googleconnector.py:76-79

  /** Minimal deterministic term encoding (spaces → %20). */
  def encodeTerm(term: Column): Column = regexp_replace(term, " ", "%20")

  /** Metapage URLs for search instances.
    *
    * `instances`: (instance_id, queryterm, apply_keywords: boolean,
    * numresults: int); `keywords`: (instance_id, keyword,
    * filter: boolean). Returns (instance_id, search_url), one row per
    * generated metapage.
    */
  def metapageUrls(instances: DataFrame, keywords: DataFrame,
                   template: String = "http://search.test/search?num=%s&q=%s")
      : DataFrame = {
    val filterKw = keywords.filter(col("filter"))
      .select(col("instance_id"), col("keyword"))
    val withKw = instances.filter(col("apply_keywords"))
      .join(filterKw, Seq("instance_id"))
      .select(col("instance_id"), col("numresults"),
        concat(col("keyword"), lit(" "), col("queryterm")).as("term"))
    val bare = instances.filter(!col("apply_keywords"))
      .select(col("instance_id"), col("numresults"), col("queryterm").as("term"))
    require(template.sliding(2).count(_ == "%s") == 2,
      s"search template must contain exactly two %%s placeholders " +
        s"(numresults, term); got: $template")
    val Array(prefix, rest) = template.split("%s", 2)
    val Array(mid, suffix) = rest.split("%s", 2)
    withKw.unionByName(bare)
      .select(col("instance_id"),
        concat(lit(prefix),
          coalesce(col("numresults"), lit(DefaultNumResults)).cast("string"),
          lit(mid), encodeTerm(col("term")), lit(suffix)).as("search_url"))
  }

  /** K4: the pagination cap — the reference appends at most 5
    * next-pages' extracted text to an article's data
    * (htmlconnector.py:96-103: `while _nextPageFound() and page_num < 5`,
    * concatenating `removeJunkData(rawpage)` per hop). The in-table
    * analog: rows are (article key, page index, text); keep the first
    * page plus at most `cap` continuation pages per article, in page
    * order, and concatenate. One aggregate, no window.
    */
  def concatPaginated(pages: DataFrame, articleCol: String, pageIdxCol: String,
                      textCol: String, cap: Int = 5): DataFrame =
    pages
      .filter(col(pageIdxCol) <= cap) // page 0 + up to `cap` next-pages
      .groupBy(col(articleCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col(pageIdxCol).as("i"),
              col(textCol).as("t")))),
            x => x.getField("t")), "").as("data"),
        count(lit(1)).as("n_pages"))
}
