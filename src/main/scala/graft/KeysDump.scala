package graft

/** Machine-readable dump of the declared contract for
  * scripts/gen_keys.py (the KEYS.md generator): one `key<TAB>hasOracle`
  * line per Registry entry. Needs no Spark session — Q holds lambdas. */
object KeysDump {
  def main(args: Array[String]): Unit =
    Registry.all.foreach { case (k, q) => println(s"$k\t${q.oracle.isDefined}") }
}
