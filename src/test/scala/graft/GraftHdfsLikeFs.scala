package graft

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A test FileSystem with the HDFS rename CONTRACT (scheme `grafthdfs`):
  * rename onto an existing destination returns false instead of
  * replacing — the semantics [[graft.lake.Fio]]'s `rename` publish
  * strategy and its rename-semantics probe rely on. Local storage
  * underneath; only the contract differs from [[GraftTestFs]]. */
class GraftHdfsLikeFs extends RawLocalFileSystem {
  override def getScheme: String = "grafthdfs"
  override def getUri: URI = URI.create("grafthdfs:///")

  // JVM-global lock: real HDFS serializes rename inside the NameNode, so
  // the exists-check and the move are one atomic step. Without it this
  // emulation is check-then-act over POSIX rename(2) (which REPLACES),
  // and two racing publishers can both "win" — a flake in the emulation,
  // not in the publish strategy under test.
  override def rename(src: Path, dst: Path): Boolean =
    GraftHdfsLikeFs.renameLock.synchronized {
      if (exists(dst)) false else super.rename(src, dst)
    }
}

object GraftHdfsLikeFs {
  private val renameLock = new Object
}
