package graft

/** Prints every registered query name, one per line — the registry
  * ground truth for `tools/round_close.py`'s artifact gate (r14 verdict
  * board #5: x185 registered after the PLANS/bench regeneration and
  * silently fell out of both committed artifacts; the gate re-derives
  * the expected name set from the CODE at HEAD instead of trusting any
  * artifact). No SparkSession: the registry is a plain Seq of (name,
  * fn, oracle) records, so this runs in milliseconds with plain
  * `java -cp "classes dir + spark jars" graft.Names` (no sbt). */
object Names {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.toSeq.sorted.foreach(println)
}
