package graft

/** Per-PROCESS scratch root for the build-time side-effect keys (the
  * roundtrip scans, the maintenance lifecycle, schema drift, GeoTIFF/COG
  * sinks). ADVICE r11: a fixed shared `${java.io.tmpdir}/graft_*` path
  * let two concurrent sessions or users on one machine overwrite /
  * clearDir each other's files and grade the wrong vintage. Scoping by
  * (user, pid) makes the scratch private to the JVM: the oracle strings
  * interpolate the SAME constant at registry init, and the driver's
  * DuckDB pass runs after Verify in a different process but against the
  * path Verify recorded in oracle_sql.json, so the scoping is
  * transparent to the grading pipeline. Dirs die with the OS tmp
  * lifecycle — these are test/grade artifacts, not a data lake (the
  * durable-layout story is the maintenance/Snapshots family).
  */
object GraftTmp {
  private val root: String = {
    val user = Option(System.getProperty("user.name")).getOrElse("anon")
    s"${System.getProperty("java.io.tmpdir")}/graft_${user}_${ProcessHandle.current().pid()}"
  }

  /** Scratch path `<tmp>/graft_<user>_<pid>/<name>` — stable for the
    * life of this JVM, disjoint across processes. */
  def dir(name: String): String = s"$root/$name"
}
