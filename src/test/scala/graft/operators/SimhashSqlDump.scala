package graft.operators

/** One-off (r20): dump the generated simhash band SQL for every rung so
  * the cross-engine twin check (DuckDB eval vs the suite's reference
  * implementation) can run driver-side — rung 4 is exercised by the
  * CORRECTNESS gate, rungs 5/6 only ever fire past 2.1M docs, so their
  * DuckDB arithmetic (shift/mask on NEGATIVE signatures) is pinned by
  * this dump + scripts-side compare (docs/PLANS_r20.md §4). */
object SimhashSqlDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/simhash_band_sqls.txt")
    val lines = Seq(4, 5, 6).flatMap { b =>
      Dedup.simhashBandSqls(b).zipWithIndex.map { case (sql, t) =>
        s"$b\t$t\t$sql"
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    println(s"##SIMHASHSQL## wrote $out")
  }
}
