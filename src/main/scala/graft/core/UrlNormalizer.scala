package graft.core

import java.nio.charset.StandardCharsets.UTF_8
import scala.util.matching.Regex

/** URL canonicalization for the crawl frontier.
  *
  * Re-expresses the normalization semantics of the reference's URL
  * normalizer (reference: crawler/utils/urlnorm.py:95-146):
  *   - lowercase scheme and host;
  *   - strip default ports (http:80, https:443, ftp:21, ...);
  *   - collapse the path (`./`, `../`, `//`, trailing `/.` and `/..`)
  *     to a fixpoint;
  *   - strip a trailing `.` from the hostname;
  *   - percent-unquote the path;
  *   - drop the fragment;
  *   - resolve relative URLs against the enclosing page / `<base href>`
  *     (mirroring the reference's literal path-concatenation semantics,
  *     crawler/utils/urlnorm.py:107-123);
  *   - `javascript:` links resolve to the enclosing site
  *     (crawler/utils/urlnorm.py:104-105).
  *
  * [[canonicalize]] additionally strips tracking query parameters
  * (utm_*, fbclid, gclid, ...) per the rebuild's north rule — the
  * reference keeps the query string verbatim (urlnorm.py:146); the
  * strip list is documented at [[UrlNormalizer.TrackingParams]].
  *
  * All functions are pure and deterministic; results are stable across
  * partitioning, executor count, and resume.
  */
object UrlNormalizer {

  /** (scheme, netloc, path, params, query, fragment) six-tuple. */
  final case class UrlParts(
      scheme: String,
      netloc: String,
      path: String,
      params: String,
      query: String,
      fragment: String)

  private val SchemeChars: Set[Char] =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ Seq('+', '-', '.')).toSet

  private val DefaultPort: Map[String, String] = Map(
    "http" -> "80", "https" -> "443", "gopher" -> "70", "news" -> "119",
    "snews" -> "563", "nntp" -> "119", "snntp" -> "563", "ftp" -> "21",
    "telnet" -> "23", "prospero" -> "191")

  private val RelativeSchemes: Set[String] =
    Set("http", "https", "news", "snews", "nntp", "snntp", "ftp", "file", "")

  private val UsesParams: Set[String] = Set(
    "ftp", "hdl", "prospero", "http", "imap", "https", "shttp", "rtsp",
    "rtspu", "sip", "sips", "mms", "sftp", "")

  // One collapse step: "seg/../", "/./", "//", trailing "/." or "/.."
  private val Collapse: Regex =
    """([^/]+/\.\./?|/\./|//|/\.$|/\.\.$)""".r

  /** Spec twin for [[splitAuthority]] — the authority split is a manual
    * scan in the hot path (one match per canonicalized link and per
    * `host_of` row); equivalence is property-tested.
    */
  private[graft] val ServerAuthority: Regex =
    """^(?:([^@]+)@)?([^:]+)(?::(.+))?$""".r

  /** `([^:]+)(?::(.+))?$` over `s`: host = prefix before the first
    * `:` (≥1 char), port = the rest (≥1 char) or null; null result on
    * no-match (empty, leading `:`, or trailing lone `:`).
    */
  private def matchHostPort(s: String): Array[String] = {
    if (s.isEmpty) return null
    val colon = s.indexOf(':')
    if (colon < 0) Array(s, null)
    else if (colon == 0 || colon == s.length - 1) null
    else Array(s.substring(0, colon), s.substring(colon + 1))
  }

  /** Manual twin of [[ServerAuthority]]: `(userinfo|null, host,
    * port|null)` or null on no-match. userinfo is the prefix before
    * the FIRST `@` (≥1 char — else the optional group is skipped and
    * the host may itself contain `@`); the regex's backtrack where
    * `user@` has no host after the `@` and falls through to
    * host=`"user@"` is reproduced by retrying without the group.
    */
  private[graft] def splitAuthority(netloc: String): Array[String] = {
    val at = netloc.indexOf('@')
    if (at >= 1) {
      val hp = matchHostPort(netloc.substring(at + 1))
      if (hp != null) return Array(netloc.substring(0, at), hp(0), hp(1))
    }
    val hp = matchHostPort(netloc)
    if (hp == null) null else Array(null, hp(0), hp(1))
  }

  /** Split a URL into a six-tuple, mirroring RFC-1808-style parsing
    * (scheme only when the prefix is a valid scheme token and the rest
    * is not a bare port number; netloc only after `//`; fragment after
    * `#`; query after `?`; params from the last path segment's `;`).
    */
  def parse(urlIn: String): UrlParts = {
    var url = urlIn
    var scheme = ""
    val i = url.indexOf(':')
    if (i > 0 && url.substring(0, i).forall(SchemeChars.contains)) {
      val rest = url.substring(i + 1)
      if (rest.isEmpty || rest.exists(c => c < '0' || c > '9')) {
        scheme = url.substring(0, i).toLowerCase
        url = rest
      }
    }
    var netloc = ""
    if (url.startsWith("//")) {
      val end = url.indexWhere(c => c == '/' || c == '?' || c == '#', 2)
      val stop = if (end < 0) url.length else end
      netloc = url.substring(2, stop)
      url = url.substring(stop)
    }
    var fragment = ""
    val h = url.indexOf('#')
    if (h >= 0) { fragment = url.substring(h + 1); url = url.substring(0, h) }
    var query = ""
    val q = url.indexOf('?')
    if (q >= 0) { query = url.substring(q + 1); url = url.substring(0, q) }
    var params = ""
    var path = url
    if (UsesParams.contains(scheme) && path.nonEmpty) {
      val lastSeg = path.lastIndexOf('/')
      val semi = path.indexOf(';', math.max(lastSeg, 0))
      if (semi >= 0) { params = path.substring(semi + 1); path = path.substring(0, semi) }
    }
    UrlParts(scheme, netloc, path, params, query, fragment)
  }

  /** Reassemble a six-tuple into a URL string. */
  def unparse(p: UrlParts): String = {
    var url = p.path
    if (p.params.nonEmpty) url = url + ";" + p.params
    if (p.netloc.nonEmpty || url.startsWith("//")) {
      if (url.nonEmpty && !url.startsWith("/")) url = "/" + url
      url = "//" + p.netloc + url
    }
    if (p.scheme.nonEmpty) url = p.scheme + ":" + url
    if (p.query.nonEmpty) url = url + "?" + p.query
    if (p.fragment.nonEmpty) url = url + "#" + p.fragment
    url
  }

  /** Percent-decode: every valid %XX becomes the raw byte; the byte
    * sequence is re-read as UTF-8 (invalid sequences fall back to the
    * replacement char, keeping the function total and deterministic).
    */
  def unquote(s: String): String = {
    if (!s.contains('%')) return s
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else {
        out.write(c.toString.getBytes(UTF_8))
        i += 1
      }
    }
    new String(out.toByteArray, UTF_8)
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Collapse `./`, `../`, `//`, trailing `/.` and `/..` to a fixpoint,
    * one leftmost replacement at a time (reference: urlnorm.py:137-143).
    *
    * Fast path: every alternative of [[Collapse]] contains either
    * `//` or `/.` as a substring, so a path containing neither cannot
    * match — the common case (one Matcher + scan per link otherwise;
    * this runs per outlink in the wave hot path). Equivalence is
    * property-tested in UrlNormalizerPropertySpec.
    */
  def collapsePath(pathIn: String): String = {
    if (pathIn.indexOf("//") < 0 && pathIn.indexOf("/.") < 0) return pathIn
    var path = pathIn
    var last = ""
    while (last != path) {
      last = path
      path = Collapse.replaceFirstIn(path, "/")
    }
    path
  }

  /** Normalize a URL, optionally resolving it relative to the enclosing
    * page (`site`) and an explicit `<base href>` (`base`). Returns None
    * for `javascript:` links with no site to fall back to.
    */
  def normalize(urlString: String, site: Option[String] = None,
                base: Option[String] = None): Option[String] =
    norm(urlString, site, base).map(unparse)

  /** Pre-parsed resolution context: when one page contributes many
    * links, the page URL and `<base href>` are parsed ONCE here
    * instead of once per link inside [[norm]] (identical results by
    * construction — [[parse]] is pure).
    */
  final class ResolveContext(site: Option[String], base: Option[String]) {
    private[UrlNormalizer] val hasBase: Boolean = base.isDefined
    private[UrlNormalizer] val hasSite: Boolean = site.isDefined
    private[UrlNormalizer] val siteParts: Option[UrlParts] = site.map(parse)
    private[UrlNormalizer] val baseParts: UrlParts =
      base.map(parse).getOrElse(null)
  }

  def norm(urlString: String, site: Option[String], base: Option[String]): Option[UrlParts] =
    norm(urlString, new ResolveContext(site, base))

  def norm(urlString: String, ctx: ResolveContext): Option[UrlParts] = {
    val first = parse(urlString)
    if (first.scheme == "javascript") {
      return ctx.siteParts
    }
    // Relative resolution (reference semantics: literal path concat).
    // Deviation from the reference (urlnorm.py:111): it concatenates the
    // WHOLE raw urlstring (query and fragment still attached) into the
    // base path AND re-appends query/fragment, duplicating them
    // (`foo?x=1` → `.../foo?x=1?x=1`). We concatenate only the path —
    // same intent, without the duplication bug.
    var resolved: String = null
    if (ctx.hasBase) {
      if (first.netloc.isEmpty) {
        val b = ctx.baseParts
        resolved = unparse(UrlParts(b.scheme, b.netloc, b.path + first.path,
          first.params, first.query, first.fragment))
      }
    } else if (first.netloc.isEmpty && first.path.nonEmpty && ctx.hasSite) {
      val s = ctx.siteParts.get
      if (first.path.startsWith("/")) {
        resolved = unparse(UrlParts(s.scheme, s.netloc, first.path,
          first.params, first.query, first.fragment))
      } else {
        val sitePath = s.path.substring(0, s.path.lastIndexOf('/') + 1)
        resolved = unparse(UrlParts(s.scheme, s.netloc, sitePath + first.path,
          first.params, first.query, first.fragment))
      }
    }

    // unresolved links re-parse to `first` exactly (parse is pure)
    val p = if (resolved == null) first else parse(resolved)
    var netloc = p.netloc
    if (netloc.nonEmpty) {
      val a = splitAuthority(netloc)
      if (a != null) { // else unparseable authority: keep verbatim
        val userinfo = a(0)
        val port = a(2)
        var host = a(1)
        if (host.nonEmpty && host.endsWith(".")) host = host.substring(0, host.length - 1)
        var auth = host.toLowerCase
        if (userinfo != null) auth = userinfo + "@" + auth
        if (port != null && !DefaultPort.get(p.scheme).contains(port))
          auth = auth + ":" + port
        netloc = auth
      }
    }
    var path = p.path
    if (RelativeSchemes.contains(p.scheme)) path = collapsePath(path)
    path = unquote(path)
    Some(UrlParts(p.scheme, netloc, path, p.params, p.query, fragment = ""))
  }

  /** Tracking query parameters stripped by [[canonicalize]] (north-rule
    * addition over the reference, which keeps the query verbatim).
    * `utm_` is a prefix match; the rest are exact, case-insensitive.
    */
  val TrackingParams: Set[String] = Set(
    "fbclid", "gclid", "gclsrc", "dclid", "msclkid", "wbraid", "gbraid",
    "yclid", "twclid", "igshid", "mc_cid", "mc_eid", "mkt_tok", "_ga",
    "_gl", "ref_src", "ref_url", "spm", "oly_enc_id", "oly_anon_id",
    "vero_id", "wickedid", "s_cid")

  private def isTracking(key: String): Boolean = {
    val k = key.toLowerCase
    k.startsWith("utm_") || TrackingParams.contains(k)
  }

  /** Strip tracking parameters from a query string, preserving the
    * relative order of surviving parameters. Deterministic.
    */
  def stripTrackingParams(query: String): String =
    if (query.isEmpty) query
    else query.split("&", -1).filterNot { kv =>
      val eq = kv.indexOf('=')
      isTracking(if (eq >= 0) kv.substring(0, eq) else kv)
    }.mkString("&")

  /** Full canonical form: [[normalize]] + tracking-param strip. This is
    * the identity under which URLs are deduplicated and hashed.
    */
  def canonicalize(urlString: String, site: Option[String] = None,
                   base: Option[String] = None): Option[String] =
    canonicalize(urlString, new ResolveContext(site, base))

  /** [[canonicalize]] against a pre-parsed [[ResolveContext]] — the
    * per-page form the link extractor uses (parse the page URL once,
    * resolve every anchor against it).
    */
  def canonicalize(urlString: String, ctx: ResolveContext): Option[String] =
    norm(urlString, ctx).map { p =>
      unparse(p.copy(query = stripTrackingParams(p.query)))
    }

  /** Hostname (no userinfo, no port) of a URL; empty if none. */
  def hostOf(url: String): String = {
    val netloc = parse(url).netloc
    if (netloc.isEmpty) return ""
    val a = splitAuthority(netloc)
    if (a == null) "" else a(1).toLowerCase.stripSuffix(".")
  }

  /** xxhash64 of the canonical URL string (seed 42 — identical to
    * Spark SQL's `xxhash64` function, so frontier tables built from
    * SQL and from this code agree bit-for-bit).
    */
  def urlHash(canonicalUrl: String): Long = Hashing.xxhash64(canonicalUrl)
}
