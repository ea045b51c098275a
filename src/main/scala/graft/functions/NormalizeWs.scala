package graft.functions

/** Hive-convention UDF class (public `evaluate`, UdfExecutor.java:61-290
  * symbol resolution) registered through the [[UdfDdl]] bridge by q157:
  * the canonical text-cleaning step of a dedup pipeline — trim,
  * lowercase, collapse runs of whitespace. Exists in the main tree so
  * the driver's Verify run can Class.forName it. */
class NormalizeWs {
  def evaluate(s: String): String =
    if (s == null) null else s.trim.toLowerCase.replaceAll("\\s+", " ")
}
