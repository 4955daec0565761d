package graft.query

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream, InputStream, OutputStream}

/** The shard transport's wire format: length-prefixed binary frames of
  * java.io.Data{Input,Output}Stream primitives over a (loopback or LAN)
  * socket. Scores cross the wire as their raw IEEE-754 bits
  * (writeDouble = writeLong(doubleToLongBits)), so a remote shard's
  * answer is BIT-IDENTICAL to the same shard in-process — the router
  * merge argument ([[ShardFan]]) survives the process boundary with no
  * tolerance anywhere.
  *
  * Frame = int32 length + body; body = op byte + op-specific payload
  * (request), or status byte + payload (response). One request/response
  * pair per frame exchange; concurrency comes from connection pooling
  * ([[RemoteShards]]) and thread-per-connection serving
  * ([[ShardServer]]), never from interleaving frames on one socket.
  *
  * Reference seam: asyncdb/proto.rs defines the reference's query RPC
  * at this same granularity (probe subset in, scored candidates out);
  * the format here is independent and minimal. */
private[query] object ShardWire {

  val OpCells: Byte = 1         // () -> Array[Int]
  val OpQueryProbes: Byte = 2   // (probes, k) -> Array[(Long, Int, Double)]
  val OpNominees: Byte = 3      // (probes, q, n) -> Array[(L, I, D, D)]
  val OpHammingQuery: Byte = 4  // (q, k) -> Array[(Long, Long)]
  val OpRerank: Byte = 5        // (q, n) -> Array[(Long, Long, Double)]
  val OpIds: Byte = 6           // () -> Array[Long]
  val OpShutdown: Byte = 7      // () -> () and the server exits
  val OpPrefetch: Byte = 8      // (cells) -> () — warm a lazy shard

  val StatusOk: Byte = 0
  val StatusErr: Byte = 1       // + UTF message

  /** 256 MiB frame bound — far above any sane (probes, k) or nominee
    * payload; a corrupt/hostile length prefix must not OOM the JVM. */
  val MaxFrameBytes: Int = 256 << 20

  def sendFrame(out: OutputStream)(write: DataOutputStream => Unit): Unit = {
    val buf = new ByteArrayOutputStream(256)
    val d = new DataOutputStream(buf)
    write(d)
    d.flush()
    val body = buf.toByteArray
    val framed = new DataOutputStream(out)
    framed.writeInt(body.length)
    framed.write(body)
    framed.flush()
  }

  /** Read one frame fully into memory and return a stream over it (an
    * EOFException inside a frame is then a protocol error, not a
    * half-read socket). */
  def recvFrame(in: InputStream): DataInputStream = {
    val d = new DataInputStream(in)
    val len = d.readInt()
    require(len >= 0 && len <= MaxFrameBytes,
      s"frame length $len outside [0, $MaxFrameBytes]")
    val body = new Array[Byte](len)
    d.readFully(body)
    new DataInputStream(new ByteArrayInputStream(body))
  }

  def writeDoubles(d: DataOutputStream, a: Array[Double]): Unit = {
    d.writeInt(a.length)
    var i = 0
    while (i < a.length) { d.writeDouble(a(i)); i += 1 }
  }

  def readDoubles(d: DataInputStream): Array[Double] = {
    val n = d.readInt()
    val a = new Array[Double](n)
    var i = 0
    while (i < n) { a(i) = d.readDouble(); i += 1 }
    a
  }

  def writeFloats(d: DataOutputStream, a: Array[Float]): Unit = {
    d.writeInt(a.length)
    var i = 0
    while (i < a.length) { d.writeFloat(a(i)); i += 1 }
  }

  def readFloats(d: DataInputStream): Array[Float] = {
    val n = d.readInt()
    val a = new Array[Float](n)
    var i = 0
    while (i < n) { a(i) = d.readFloat(); i += 1 }
    a
  }

  def writeInts(d: DataOutputStream, a: Array[Int]): Unit = {
    d.writeInt(a.length)
    var i = 0
    while (i < a.length) { d.writeInt(a(i)); i += 1 }
  }

  def readInts(d: DataInputStream): Array[Int] = {
    val n = d.readInt()
    val a = new Array[Int](n)
    var i = 0
    while (i < n) { a(i) = d.readInt(); i += 1 }
    a
  }

  def writeLongs(d: DataOutputStream, a: Array[Long]): Unit = {
    d.writeInt(a.length)
    var i = 0
    while (i < a.length) { d.writeLong(a(i)); i += 1 }
  }

  def readLongs(d: DataInputStream): Array[Long] = {
    val n = d.readInt()
    val a = new Array[Long](n)
    var i = 0
    while (i < n) { a(i) = d.readLong(); i += 1 }
    a
  }

  def writeProbes(d: DataOutputStream,
                  probes: Array[(Int, Array[Double])]): Unit = {
    d.writeInt(probes.length)
    probes.foreach { case (cell, loc) =>
      d.writeInt(cell)
      writeDoubles(d, loc)
    }
  }

  def readProbes(d: DataInputStream): Array[(Int, Array[Double])] = {
    val n = d.readInt()
    Array.fill(n)((d.readInt(), readDoubles(d)))
  }

  def writeHits(d: DataOutputStream, a: Array[(Long, Int, Double)]): Unit = {
    d.writeInt(a.length)
    a.foreach { case (id, cell, dist) =>
      d.writeLong(id); d.writeInt(cell); d.writeDouble(dist)
    }
  }

  def readHits(d: DataInputStream): Array[(Long, Int, Double)] = {
    val n = d.readInt()
    Array.fill(n)((d.readLong(), d.readInt(), d.readDouble()))
  }

  def writeNominees(d: DataOutputStream,
                    a: Array[(Long, Int, Double, Double)]): Unit = {
    d.writeInt(a.length)
    a.foreach { case (id, cell, s1, s2) =>
      d.writeLong(id); d.writeInt(cell); d.writeDouble(s1); d.writeDouble(s2)
    }
  }

  def readNominees(d: DataInputStream): Array[(Long, Int, Double, Double)] = {
    val n = d.readInt()
    Array.fill(n)((d.readLong(), d.readInt(), d.readDouble(), d.readDouble()))
  }

  def writeHammingHits(d: DataOutputStream, a: Array[(Long, Long)]): Unit = {
    d.writeInt(a.length)
    a.foreach { case (id, h) => d.writeLong(id); d.writeLong(h) }
  }

  def readHammingHits(d: DataInputStream): Array[(Long, Long)] = {
    val n = d.readInt()
    Array.fill(n)((d.readLong(), d.readLong()))
  }

  def writeRerank(d: DataOutputStream,
                  a: Array[(Long, Long, Double)]): Unit = {
    d.writeInt(a.length)
    a.foreach { case (id, h, s) =>
      d.writeLong(id); d.writeLong(h); d.writeDouble(s)
    }
  }

  def readRerank(d: DataInputStream): Array[(Long, Long, Double)] = {
    val n = d.readInt()
    Array.fill(n)((d.readLong(), d.readLong(), d.readDouble()))
  }
}
