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

  override def rename(src: Path, dst: Path): Boolean =
    if (exists(dst)) false else super.rename(src, dst)
}
