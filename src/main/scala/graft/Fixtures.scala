package graft

/** Root directory for engine-written fixture layouts (CSV/JSON scan
  * fixtures, bucketed/z-order tables, shard sinks). Derived at runtime —
  * never a hardcoded checkout path — so any clone location writes inside
  * its own `target/`:
  *
  *   1. `-Dgraft.fixtures.dir=...` overrides explicitly (tests / CI);
  *   2. otherwise `<user.dir>/target/graft_fixtures`, which is the sbt
  *      working directory in every entry point (Verify/Bench/ScalaTest all
  *      launch from the repo root).
  *
  * The same runtime value is interpolated into both the Spark query and
  * its DuckDB oracle SQL, so the two engines always read identical bytes
  * regardless of where the checkout lives. */
object Fixtures {
  val dir: String = sys.props.get("graft.fixtures.dir")
    .getOrElse(s"${sys.props("user.dir")}/target/graft_fixtures")
}
