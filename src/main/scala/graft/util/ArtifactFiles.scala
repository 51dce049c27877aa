package graft.util

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Atomic writer for the small fixed-name artifact files some queries
  * stage into java.io.tmpdir (frozen merges.txt / vocab.txt fixtures).
  * Two concurrent sessions (Verify racing a sweep) previously raced a
  * non-atomic `Files.write` against a reader — content is deterministic
  * so a torn read was the only hazard, but a torn read either fails a
  * round-trip `require` or, worse, loads a truncated table (r10 ADVICE).
  * Writing to a unique sibling temp file and ATOMIC_MOVE-ing onto the
  * fixed name makes every read see a complete file (same-directory rename
  * is atomic on POSIX); last-writer-wins is fine because all writers
  * produce identical bytes.
  */
object ArtifactFiles {

  /** Write `lines` atomically to `<tmpdir>/<name>`; returns the path. */
  def writeAtomic(name: String, lines: Seq[String]): Path = {
    val dir = Paths.get(sys.props("java.io.tmpdir"))
    val target = dir.resolve(name)
    val tmp = Files.createTempFile(dir, s".$name.", ".tmp")
    try {
      Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
    target
  }
}
