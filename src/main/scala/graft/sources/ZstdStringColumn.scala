package graft.sources

import com.github.luben.zstd.Zstd
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Dictionary-compressed string column (reference:
  * src/silo/storage/column/zstd_compressed_string_column.h:26-78): per-row
  * zstd blobs compressed against a shared dictionary string — for genomic
  * data the dictionary is the reference genome, making near-reference
  * sequences compress to almost nothing.
  *
  * Normal persistence should prefer plain StringType + Parquet ZSTD page
  * compression (same codec, codegen-friendly); this column type exists for
  * byte-parity with reference state and for lazy decompression of rarely
  * read payloads (decompress AFTER limit — ≙ MapPullupPass motivation).
  * zstd-jni ships with Spark itself, so there is no extra dependency.
  */
object ZstdStringColumn {

  /** Simple framed blob: 4-byte big-endian uncompressed length + zstd frame
    * compressed with `dict` as the prefix dictionary.
    */
  def compressBytes(s: String, dict: Array[Byte]): Array[Byte] = {
    val raw = s.getBytes("UTF-8")
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    try {
      ctx.loadDict(dict)
      val blob = ctx.compress(raw)
      val out = java.nio.ByteBuffer.allocate(4 + blob.length)
      out.putInt(raw.length).put(blob)
      out.array()
    } finally ctx.close()
  }

  def decompressBytes(blob: Array[Byte], dict: Array[Byte]): String = {
    val buf = java.nio.ByteBuffer.wrap(blob)
    val rawLen = buf.getInt()
    val body = java.util.Arrays.copyOfRange(blob, 4, blob.length)
    val ctx = new com.github.luben.zstd.ZstdDecompressCtx()
    try {
      ctx.loadDict(dict)
      new String(ctx.decompress(body, rawLen), "UTF-8")
    } finally ctx.close()
  }

  /** Column-level compress/decompress against a shared dictionary string.
    * UDF-based by design: this is a cold-path payload codec, kept OUT of
    * hot predicates (filter on metadata/diff columns, decompress last).
    */
  def compress(c: Column, dictionary: String): Column = {
    val dict = dictionary.getBytes("UTF-8")
    val f = udf((s: String) => if (s == null) null else compressBytes(s, dict))
    f(c)
  }

  def decompress(c: Column, dictionary: String): Column = {
    val dict = dictionary.getBytes("UTF-8")
    val f = udf((b: Array[Byte]) => if (b == null) null else decompressBytes(b, dict))
    f(c)
  }
}
