package graft.sources

/** Config-file source (SURVEY.md §2.1 S5) — the reference reads
  * `blockchain2graph.conf` with `datadir=` / `configdir=` / `bitcoindir=`
  * lines and validates them driver-side (BlockchainToGraph.java:1142–1216).
  * Same contract here: `key=value` lines, `#` comments, required-key
  * validation; stays driver-side by design (config is not data).
  */
object ConfSource {

  def parse(lines: Seq[String]): Map[String, String] =
    lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        l.indexOf('=') match {
          case -1 => None
          case i => Some(l.substring(0, i).trim -> l.substring(i + 1).trim)
        }
      }
      .toMap

  def load(path: String, required: Seq[String] = Nil): Map[String, String] = {
    val conf = parse(
      scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))).asScala.toSeq)
    val missing = required.filterNot(conf.contains)
    require(missing.isEmpty, s"missing config keys: ${missing.mkString(", ")}")
    conf
  }
}
