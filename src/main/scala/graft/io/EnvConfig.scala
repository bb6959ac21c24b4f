package graft.io

/** Dotenv-style configuration surface — the reference drives its run
  * entirely from a `.env` file (`load_dotenv()` + `os.getenv`,
  * /root/reference/src/main.py:59-86: Mongo/MySQL endpoints, the
  * MONGO_START_DATE/MONGO_END_DATE ingestion window, OUTPUT_PATH and
  * RELOAD_INVENTORY_DAILY). CandyMain reads the same keys when an
  * env file is present; explicit CLI flags win.
  *
  * Parsing is the common dotenv subset: one `KEY=VALUE` per line,
  * blank lines and `#` comments skipped, an optional `export `
  * prefix tolerated, single/double quotes around the value stripped,
  * whitespace trimmed. No interpolation — values are literal. */
object EnvConfig {

  /** Parse `path`; a missing file is an empty config (load_dotenv
    * semantics — the reference runs fine without one and takes
    * every setting from the process environment instead). */
  def load(path: String): Map[String, String] = {
    val f = new java.io.File(path)
    if (!f.exists()) return Map.empty
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.getLines().flatMap(parseLine).toMap
    finally src.close()
  }

  private[io] def parseLine(raw: String): Option[(String, String)] = {
    val line = raw.trim
    if (line.isEmpty || line.startsWith("#")) return None
    val body = if (line.startsWith("export ")) line.stripPrefix("export ").trim
               else line
    val eq = body.indexOf('=')
    if (eq <= 0) return None
    val key = body.substring(0, eq).trim
    val v0 = body.substring(eq + 1).trim
    val v =
      if (v0.length >= 2 &&
          ((v0.head == '"' && v0.last == '"') ||
           (v0.head == '\'' && v0.last == '\'')))
        v0.substring(1, v0.length - 1)
      else v0
    Some(key -> v)
  }

  /** Inclusive YYYYMMDD day list — the reference's get_date_range
    * (src/main.py:29-40), which names the per-day collections to
    * ingest; here it names the per-day `transactions_<day>.json`
    * files. */
  def dateRange(start: String, end: String): Seq[String] = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")
    val s = java.time.LocalDate.parse(start, fmt)
    val e = java.time.LocalDate.parse(end, fmt)
    require(!e.isBefore(s), s"end date $end before start date $start")
    Iterator.iterate(s)(_.plusDays(1)).takeWhile(!_.isAfter(e))
      .map(_.format(fmt)).toSeq
  }
}
