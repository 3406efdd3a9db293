package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.net.URI
import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** COPY BINARY analogue — the reference's third COPY wire format
  * (`/root/reference/src/backend/commands/copy.c`, binary branch in
  * `copyto.c`/`copyfrom.c`: `CopySendInt16/32`, per-field length-prefixed
  * big-endian payloads). The on-disk layout here follows that format's
  * public specification exactly:
  *
  *   - file header: 11-byte signature `PGCOPY\n\377\r\n\0`, int32 flags
  *     (0), int32 header-extension length (0);
  *   - per tuple: int16 field count, then per field int32 byte length
  *     (−1 encodes NULL) + payload bytes, all big-endian;
  *   - trailer: int16 −1.
  *
  * Field payloads use the reference's binary send formats for the
  * supported type subset: int4/int8/float8 big-endian, bool as one byte,
  * text as raw UTF-8, date as int32 days since 2000-01-01, timestamp
  * (with or without zone — PG's zoneless `timestamp` maps to Spark's
  * TimestampNTZ) as int64 micros since 2000-01-01 (the PG epoch — NOT
  * unix, exactly as `date_send`/`timestamp_send` put it on the wire).
  *
  * Execution is Spark-shaped, not a driver loop: each task encodes its own
  * partition and streams it to `part-NNNNN.bin` directly on the target
  * filesystem (no driver collect, no per-row shuffle — the same "every
  * segment writes its own file" discipline as the reference's segment-
  * parallel COPY). The reader decodes whole files via the `binaryFile`
  * source, so decode parallelism = file count = writer parallelism. Like
  * the real COPY BINARY, the file embeds no schema: the reader is handed
  * one and the round-trip spec asserts fidelity (values AND dtypes).
  */
object CopyBinary {
  private val Signature: Array[Byte] =
    Array('P', 'G', 'C', 'O', 'P', 'Y', '\n', 0xFF.toByte, '\r', '\n', 0)
  /** 2000-01-01 minus 1970-01-01, in days / micros (PG binary epoch). */
  private val PgEpochDays = 10957
  private val PgEpochMicros = 946684800000000L

  private def checkSupported(schema: StructType): Unit = schema.fields.foreach { f =>
    f.dataType match {
      case IntegerType | LongType | DoubleType | StringType | BooleanType |
           DateType | TimestampType | TimestampNTZType => ()
      case dt => throw new IllegalArgumentException(
        s"copy binary: unsupported type ${dt.simpleString} for column ${f.name}")
    }
  }

  def write(df: DataFrame, path: String, overwrite: Boolean = false): Unit = {
    val schema = df.schema
    checkSupported(schema)
    val uri = path
    // Fail fast (or clear, under overwrite) if the destination already
    // holds part files: otherwise the tasks' exists-check below — meant
    // only to arbitrate same-job speculative attempts — would treat the
    // STALE files as winners and silently keep old data, and a prior
    // write with more partitions would leave extra part files that the
    // reader's part-*.bin glob mixes into the result.
    locally {
      val conf = df.sparkSession.sessionState.newHadoopConf()
      val fs = FileSystem.get(new URI(uri), conf)
      val dir = new Path(uri)
      if (fs.exists(dir)) {
        val stale = fs.globStatus(new Path(dir, "part-*.bin"))
        if (stale != null && stale.nonEmpty) {
          require(overwrite, s"copy binary: destination $uri already has " +
            s"${stale.length} part-*.bin file(s); pass overwrite=true to replace")
          stale.foreach(st => fs.delete(st.getPath, false))
        }
        // orphaned stage files from killed prior attempts are garbage
        // either way — clear them so they can't accumulate
        val orphans = fs.globStatus(new Path(dir, ".part-*.bin.attempt-*"))
        if (orphans != null) orphans.foreach(st => fs.delete(st.getPath, false))
      }
    }
    // The session's Hadoop configuration, shipped as a plain Map
    // (Configuration itself is not serializable): filesystem auth and
    // defaultFS settings configured through spark.hadoop.* must reach
    // the executor-side writers — a bare `new Configuration()` on the
    // executor would silently drop them.
    val confMap: Map[String, String] = {
      val c = df.sparkSession.sessionState.newHadoopConf()
      val b = Map.newBuilder[String, String]
      val it = c.iterator()
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    df.rdd.foreachPartition { rows =>
      val conf = new Configuration(false)
      confMap.foreach { case (k, v) => conf.set(k, v) }
      val pid = TaskContext.getPartitionId()
      val fs = FileSystem.get(new URI(uri), conf)
      val file = new Path(uri, f"part-$pid%05d.bin")
      // stage+rename commit (the repo-wide staged-write discipline): a
      // task that dies mid-partition leaves only a dot-prefixed stage
      // file invisible to the reader's part-*.bin glob, never a
      // truncated trailerless final file; concurrent speculative
      // attempts stage under distinct attempt ids and the loser simply
      // discards its stage when the final file already exists
      val staged = new Path(uri,
        f".part-$pid%05d.bin.attempt-${TaskContext.get().taskAttemptId()}")
      val out = new DataOutputStream(
        new java.io.BufferedOutputStream(fs.create(staged, true), 1 << 16))
      try {
        out.write(Signature); out.writeInt(0); out.writeInt(0)
        rows.foreach { row =>
          out.writeShort(schema.length)
          var i = 0
          while (i < schema.length) {
            if (row.isNullAt(i)) out.writeInt(-1)
            else schema(i).dataType match {
              case IntegerType => out.writeInt(4); out.writeInt(row.getInt(i))
              case LongType    => out.writeInt(8); out.writeLong(row.getLong(i))
              case DoubleType  => out.writeInt(8)
                out.writeLong(java.lang.Double.doubleToLongBits(row.getDouble(i)))
              case BooleanType => out.writeInt(1)
                out.writeByte(if (row.getBoolean(i)) 1 else 0)
              case StringType  =>
                val b = row.getString(i).getBytes(StandardCharsets.UTF_8)
                out.writeInt(b.length); out.write(b)
              case DateType    => out.writeInt(4)
                out.writeInt((row.getDate(i).toLocalDate.toEpochDay - PgEpochDays).toInt)
              case TimestampType => out.writeInt(8)
                val ts = row.getTimestamp(i)
                val micros = ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
                out.writeLong(micros - PgEpochMicros)
              case TimestampNTZType => out.writeInt(8)
                // PG's timestamp (no zone) IS this type: wall-clock micros
                val ldt = row.getAs[java.time.LocalDateTime](i)
                out.writeLong(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
                  + ldt.getNano / 1000L - PgEpochMicros)
              case dt => throw new IllegalStateException(dt.toString)
            }
            i += 1
          }
        }
        out.writeShort(-1)
      } finally out.close()
      if (fs.exists(file)) fs.delete(staged, false) // lost a speculative race
      else if (!fs.rename(staged, file)) {
        fs.delete(staged, false)
        require(fs.exists(file), s"commit failed: $staged -> $file")
      }
      // best-effort GC of sibling attempts' stage files (a retried or
      // killed attempt's orphan would otherwise linger until the next
      // overwrite): the final file exists now, so any remaining
      // .part-$pid stage file is a loser by definition
      val leftovers = fs.globStatus(new Path(uri, f".part-$pid%05d.bin.attempt-*"))
      if (leftovers != null) leftovers.foreach(st =>
        try fs.delete(st.getPath, false) catch { case _: Throwable => () })
    }
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    checkSupported(schema)
    val files = spark.read.format("binaryFile")
      .load(new Path(path, "part-*.bin").toString)
      .select("content")
    val rows = files.rdd.flatMap { fileRow =>
      val in = new DataInputStream(
        new java.io.ByteArrayInputStream(fileRow.getAs[Array[Byte]](0)))
      val sig = new Array[Byte](11); in.readFully(sig)
      require(java.util.Arrays.equals(sig, Signature), "bad COPY BINARY signature")
      require(in.readInt() == 0, "unsupported COPY BINARY flags (OIDs)")
      in.skipBytes(in.readInt()) // header extension — skip, per spec
      Iterator.continually(in.readShort()).takeWhile(_ != -1).map { nFields =>
        require(nFields == schema.length,
          s"tuple has $nFields fields, schema has ${schema.length}")
        val vals = schema.fields.map { f =>
          val len = in.readInt()
          if (len == -1) null
          else f.dataType match {
            case IntegerType => in.readInt()
            case LongType    => in.readLong()
            case DoubleType  => java.lang.Double.longBitsToDouble(in.readLong())
            case BooleanType => in.readByte() == 1
            case StringType  =>
              val b = new Array[Byte](len); in.readFully(b)
              new String(b, StandardCharsets.UTF_8)
            case DateType    => java.sql.Date.valueOf(
              java.time.LocalDate.ofEpochDay(in.readInt().toLong + PgEpochDays))
            case TimestampType =>
              val micros = in.readLong() + PgEpochMicros
              val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
              ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
              ts
            case TimestampNTZType =>
              val micros = in.readLong() + PgEpochMicros
              java.time.LocalDateTime.ofEpochSecond(
                Math.floorDiv(micros, 1000000L),
                (Math.floorMod(micros, 1000000L) * 1000L).toInt,
                java.time.ZoneOffset.UTC)
            case dt => throw new IllegalStateException(dt.toString)
          }
        }
        Row.fromSeq(vals.toIndexedSeq)
      }.toArray.iterator // materialize before the stream is exhausted
    }
    spark.createDataFrame(rows, schema)
  }
}
