object EntrySmoke {
  def main(a: Array[String]): Unit = {
    val s = graft.EngineSession.local("4", "entry-smoke")
    val n = graft.SparkEntry.entry(s).count()
    println(s"ENTRY_ROWS=$n")
    s.stop()
  }
}
