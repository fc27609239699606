package graft.tools
import java.nio.file.{Files, Paths}
/** Debug: print one query's oracle SQL to a file. */
object DumpOracle {
  def main(args: Array[String]): Unit =
    Files.writeString(Paths.get(args(1)), graft.SparkEntry.oracleSql(args(0)))
}
