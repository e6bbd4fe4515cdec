package graft.sync

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** T2 — persisted CDC watermark (reference save_last_run_config /
  * `last_modified`, flows/main_flow.py:603,611). One timestamp string per
  * store, atomically replaced. The batch analog of a Structured Streaming
  * checkpoint offset; the streaming variant uses `checkpointLocation`
  * instead (graft.streaming). */
class WatermarkStore(dir: String) {
  private val path: Path = Paths.get(dir, "_watermark")
  Files.createDirectories(Paths.get(dir))

  /** Sentinel mirrors the reference's `'0001-01-01T00:00:00'` default
    * (flows/main_flow.py:588). */
  val Epoch = "0001-01-01 00:00:00"

  def load(): Option[String] =
    if (Files.exists(path)) Some(Files.readString(path).trim).filter(_.nonEmpty)
    else None

  def loadOrEpoch(): String = load().getOrElse(Epoch)

  def save(watermark: String): Unit = {
    val tmp = Paths.get(path.toString + ".tmp")
    Files.writeString(tmp, watermark)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
