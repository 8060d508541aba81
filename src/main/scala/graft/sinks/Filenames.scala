package graft.sinks

/** F15 — output filename derivation (reference main.py:1533-1538, 604-613,
  * 684-692, 743-748): URLs become `domain_tld.csv`; file names lose their
  * extension and sanitize dots/spaces to underscores. */
object Filenames {

  def csvNameFor(source: String): String =
    // scheme check, not a bare 'http' prefix: 'httpd_log.csv' is a file
    // name, and 'http report.csv' would crash URI parsing on the space
    if (source.startsWith("http://") || source.startsWith("https://")) {
      val host = Option(new java.net.URI(source).getHost).getOrElse("converted_data")
      host.stripPrefix("www.").replace(".", "_") + ".csv"
    } else {
      val base = if (source.isEmpty) "converted_data"
                 else source.replaceAll("\\.[^.]*$", "")
      base.replace(".", "_").replace(" ", "_") + ".csv"
    }

  /** `<base>_<format>.xml` for the CSV->XML converters (main.py:604-613). */
  def xmlNameFor(source: String, format: String): String = {
    val base =
      if (source == null || source.isEmpty) "converted_data"
      else if (source.endsWith(".csv")) source.dropRight(4)
      else source
    s"${base}_$format.xml"
  }
}
