package graft.io

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** Test-only OBJECT-STORE STAND-IN: a Hadoop `FileSystem` registered under
  * the foreign scheme `mock3:` (via `fs.mock3.impl`), backed by local disk.
  *
  * Purpose: the reference's deployment surface is an S3-compatible store +
  * WebHDFS (its docker-compose runs MinIO); with zero egress and no
  * hadoop-aws jar in this environment, the closest honest integration test
  * is driving every Layers operation through a NON-`file:` scheme that
  * resolves through the same `Path.getFileSystem(conf)` machinery an
  * `s3a://` URI would — proving Layers and the Spark writers/readers are
  * URI-agnostic (no local-path assumptions, no default-FS reliance).
  * Swapping `mock3://` for `s3a://` changes configuration, not code.
  */
class Mock3FileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mock3"
  override def getUri: URI = URI.create("mock3:///")
}
