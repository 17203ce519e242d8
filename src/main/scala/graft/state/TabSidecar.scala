package graft.state

import java.nio.file.{Files, Path, StandardCopyOption}

/** Atomic tab-separated sidecar files — the shared dialect of every
  * durable per-table declaration in this engine (`__checks__` began it;
  * `__tags__`, `__rowpolicies__` and `__fks__` reuse it). The reference
  * keeps the equivalents durable by construction — LF-Tags live in Lake
  * Formation and the schema in Glue, surviving every process
  * (`crawler_stage.py:266-953`) — so an engine whose registries were
  * process-local TrieMaps would silently drop governance on restart and
  * never share it with a second writer. A sidecar next to the table is
  * the parquet-fallback answer: metadata-sized, atomically replaced,
  * travels with the data.
  *
  * Write = temp file in the target's directory + ATOMIC_MOVE (readers
  * never observe a torn file); read = whole-file lines. Callers encode
  * one record per line, fields tab-separated (fields must not contain
  * tabs or newlines — [[requireCell]] enforces it at declaration time,
  * where the error is actionable). */
private[graft] object TabSidecar {

  def requireCell(s: String, what: String): String = {
    require(s.indexOf('\t') < 0 && s.indexOf('\n') < 0 && s.indexOf('\r') < 0,
      s"$what must not contain tabs or newlines: ${s.take(80)}")
    s
  }

  def write(target: Path, lines: Seq[String]): Unit = {
    val tmp = Files.createTempFile(
      target.toAbsolutePath.getParent, "." + target.getFileName, ".tmp")
    Files.writeString(tmp, lines.mkString("", "\n", "\n"))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def read(target: Path): Seq[String] = {
    if (!Files.isRegularFile(target)) return Nil
    import scala.jdk.CollectionConverters._
    Files.readAllLines(target).asScala.toSeq.filter(_.nonEmpty)
  }

  def delete(target: Path): Unit = {
    Files.deleteIfExists(target); ()
  }
}
