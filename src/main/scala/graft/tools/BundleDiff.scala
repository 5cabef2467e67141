package graft.tools

/** Dev probe: print the emitted bundle for the golden colspec (byte-diff
  * iteration aid for GoldenSqlSpec's byte-identity assertion). */
object BundleDiff {
  def main(args: Array[String]): Unit = {
    import graft.compile.ColumnSpecCompiler
    import graft.compile.ColumnSpecCompiler.Config
    val rowsIn = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "src/test/resources/graft/golden_colspec.csv"))
    val ours = ColumnSpecCompiler.emitBundle(
      ColumnSpecCompiler.fromCsv(rowsIn),
      Config(viewPrefix = "hm_", viewSuffix = "_vw", sourceViewFrom = "hm_db",
        jsonColumn = "CAST(val AS STRING)", tblPath = "$.tbl"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/our_bundle.sql"), ours)
    println("WROTE /tmp/our_bundle.sql")
  }
}
