package graft

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

/** An OBJECT-STORE-SHAPED test FileSystem (scheme `graftobj`, registered
  * via `spark.hadoop.fs.graftobj.impl`) modeling the two Hadoop-connector
  * behaviors that break naive control planes on plain S3/ABFS
  * (VERDICT r6 #2):
  *
  *  - `append` throws `UnsupportedOperationException` (S3A/ABFS do) —
  *    [[graft.lake.Fio.append]] must fall back to rotating part files or
  *    the first metrics write kills the micro-batch;
  *  - `rename` REPLACES an existing destination (S3A's copy-based rename;
  *    local `renameTo` inherited from [[RawLocalFileSystem]] does the
  *    same) — so the tmp-then-rename publish is NOT create-exclusive
  *    here and the specs run with `graft.fio.publish.graftobj=create`,
  *    the conditional-put seam (`create(target, overwrite = false)`,
  *    which this FS enforces — the If-None-Match analog).
  */
class GraftObjFs extends RawLocalFileSystem {
  override def getScheme: String = "graftobj"
  override def getUri: URI = URI.create("graftobj:///")

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = {
    GraftObjFs.appendsRejected.incrementAndGet()
    throw new UnsupportedOperationException(
      "graftobj: append is not supported (object store)")
  }
}

object GraftObjFs {
  val appendsRejected = new java.util.concurrent.atomic.AtomicLong
}
