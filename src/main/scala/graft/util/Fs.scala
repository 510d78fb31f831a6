package graft.util

import java.nio.file.{Files, Path}

/** Small filesystem helpers shared by the harness and operators. */
object Fs {

  /** Delete `root` and everything under it (children before parents);
    * missing paths and plain files are fine. Best-effort per entry —
    * a file that vanishes mid-walk does not abort the rest.
    */
  def deleteRecursively(root: Path): Unit = {
    if (!Files.exists(root)) return
    val walk = Files.walk(root)
    try walk.sorted(java.util.Comparator.reverseOrder[Path]())
      .iterator().forEachRemaining(p => Files.deleteIfExists(p))
    finally walk.close()
  }

  def deleteRecursively(root: String): Unit = deleteRecursively(java.nio.file.Paths.get(root))
}
