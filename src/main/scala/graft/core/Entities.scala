package graft.core

/** HTML entity decoding (the ALL_ENTITIES conversion the reference gets
  * from BeautifulStoneSoup, crawler/utils/utils.py:301,453, plus the
  * cgi-unescape second pass inside stripHtml, utils.py:134).
  * Covers numeric refs and the common named set; unknown refs pass
  * through verbatim. Pure and deterministic.
  */
object Entities {

  private val Named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "iexcl" -> "¡",
    "cent" -> "¢", "pound" -> "£", "curren" -> "¤",
    "yen" -> "¥", "brvbar" -> "¦", "sect" -> "§",
    "uml" -> "¨", "copy" -> "©", "ordf" -> "ª",
    "laquo" -> "«", "not" -> "¬", "shy" -> "­",
    "reg" -> "®", "macr" -> "¯", "deg" -> "°",
    "plusmn" -> "±", "sup2" -> "²", "sup3" -> "³",
    "acute" -> "´", "micro" -> "µ", "para" -> "¶",
    "middot" -> "·", "cedil" -> "¸", "sup1" -> "¹",
    "ordm" -> "º", "raquo" -> "»", "frac14" -> "¼",
    "frac12" -> "½", "frac34" -> "¾", "iquest" -> "¿",
    "times" -> "×", "divide" -> "÷", "szlig" -> "ß",
    "agrave" -> "à", "aacute" -> "á", "eacute" -> "é",
    "egrave" -> "è", "iacute" -> "í", "oacute" -> "ó",
    "uacute" -> "ú", "ntilde" -> "ñ", "ccedil" -> "ç",
    "ouml" -> "ö", "uuml" -> "ü", "auml" -> "ä",
    "euro" -> "€", "ndash" -> "–", "mdash" -> "—",
    "lsquo" -> "‘", "rsquo" -> "’", "sbquo" -> "‚",
    "ldquo" -> "“", "rdquo" -> "”", "bdquo" -> "„",
    "dagger" -> "†", "Dagger" -> "‡", "bull" -> "•",
    "hellip" -> "…", "permil" -> "‰", "prime" -> "′",
    "Prime" -> "″", "lsaquo" -> "‹", "rsaquo" -> "›",
    "oline" -> "‾", "frasl" -> "⁄", "trade" -> "™")

  /** Decode `&name;`, `&#NNN;`, `&#xHH;`. Unknown / malformed refs are
    * left verbatim. Single pass, left to right.
    */
  def decode(s: String): String = {
    var amp = s.indexOf('&')
    if (amp < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    // bulk-append the runs between '&'s (this runs once per text node
    // in the render hot path; the old per-char loop was measurable)
    var i = 0
    while (amp >= 0) {
      sb.append(s, i, amp)
      i = amp
      val semi = s.indexOf(';', amp + 1)
      var consumed = false
      if (semi > amp && semi - amp <= 12) {
        val body = s.substring(amp + 1, semi)
        val decoded: Option[String] =
          if (body.startsWith("#x") || body.startsWith("#X")) {
            try Some(new String(Character.toChars(Integer.parseInt(body.substring(2), 16))))
            catch { case _: Exception => None }
          } else if (body.startsWith("#")) {
            try Some(new String(Character.toChars(Integer.parseInt(body.substring(1)))))
            catch { case _: Exception => None }
          } else Named.get(body)
        decoded match {
          case Some(d) => sb.append(d); i = semi + 1; consumed = true
          case None =>
        }
      }
      if (!consumed) { sb.append('&'); i = amp + 1 }
      amp = s.indexOf('&', i)
    }
    sb.append(s, i, n)
    sb.toString
  }
}
