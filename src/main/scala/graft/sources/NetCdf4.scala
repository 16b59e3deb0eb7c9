package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pure-JVM NetCDF-4 (HDF5 container) SUBSET codec, written against the
  * public HDF5 File Format Specification — closing the last decode-parity
  * gap with the reference, whose `xarray.open_dataset` accepts both the
  * classic layouts ([[NetCdf]]) and the HDF5-backed NetCDF-4 the DMI EDR
  * API can serve (dmi_ingestor/ingestor.py:200).
  *
  * Scope (honest, and narrower than [[NetCdf]]'s by design): exactly the
  * shape a flat one-cube NetCDF-4 *classic-model* file has when written
  * by default-configuration libnetcdf/libhdf5 without chunking or
  * compression —
  *   - superblock version 0 or 1, 8-byte offsets/lengths;
  *   - version-1 object headers (with continuation blocks), symbol-table
  *     groups (v1 B-tree + local heap), a FLAT root group (the NetCDF-4
  *     classic data model — a nested group is rejected, not misread);
  *   - dataspace v1/v2, fixed-point and IEEE-float datatypes in either
  *     byte order, data layout v3 contiguous or compact;
  *   - v1/v2/v3 attribute messages with string and numeric scalars/
  *     arrays — enough for the CF attributes a forecast cube uses
  *     (`units`, `scale_factor`, `add_offset`, `_FillValue`); vlen/
  *     reference attributes (`DIMENSION_LIST`, `REFERENCE_LIST`) are
  *     SKIPPED and axis mapping falls back to coordinate names + shape
  *     matching, the same convention [[NetCdf.decodeCube]] applies.
  * Chunked/filtered layouts, v2 object headers ("latest format"), and
  * nested groups are rejected with a message naming the feature;
  * [[graft.operators.Fetch.containerGuard]] turns that rejection into
  * R17 skip-parameter semantics at the fetch boundary, so an
  * out-of-subset file skips cleanly instead of failing a job.
  *
  * The writer emits the same subset (the container dual of
  * [[NetCdf.encodeCube]]), which is what makes the codec testable
  * offline: encode∘decode is pinned as the identity in NetCdf4Spec, and
  * the reader is additionally fuzzed on truncated/corrupted streams.
  * Scale note: like the classic codec, this runs at the edge on one
  * staged MB-scale response; everything downstream of the returned
  * DataFrame is distributed.
  */
object NetCdf4 {

  private val Magic =
    Array(0x89, 'H'.toInt, 'D'.toInt, 'F'.toInt, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  private val Undef = -1L // 0xFFFF_FFFF_FFFF_FFFF: the spec's undefined address

  /** `\x89HDF\r\n\x1a\n` — is this an HDF5 stream at all? (4-byte prefix
    * check is enough to distinguish from classic CDF / CSV.) */
  def isHdf5(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == Magic(0) && bytes(1) == Magic(1) &&
      bytes(2) == Magic(2) && bytes(3) == Magic(3)

  // -- parsed model ---------------------------------------------------

  /** Numeric on-disk type. `signed` only meaningful for fixed-point. */
  case class NumType(float: Boolean, size: Int, bigEndian: Boolean, signed: Boolean)

  /** Attribute: string attrs carry `text`, numeric attrs carry `nums`. */
  case class H5Attr(name: String, text: String, nums: Seq[Double]) {
    def first: Option[Double] = nums.headOption
  }

  /** One dataset (= one NetCDF-4 variable). `compact` holds inline data
    * for layout class 0; otherwise `dataAddr`/`dataSize` locate the
    * contiguous blob (`dataAddr == Undef` → never written → all-fill). */
  case class H5Dataset(
      name: String, shape: Seq[Long], dtype: NumType,
      dataAddr: Long, dataSize: Long, compact: Option[Array[Byte]],
      attrs: Seq[H5Attr]) {
    def attr(n: String): Option[H5Attr] = attrs.find(_.name == n)
  }

  case class H5File(datasets: Seq[H5Dataset], bytes: Array[Byte]) {
    def dataset(n: String): Option[H5Dataset] = datasets.find(_.name == n)
  }

  // -- reader ---------------------------------------------------------

  /** Header-only parse validity probe (no data is read) — cheap enough
    * for the fetch boundary. Left = why the stream is out of subset. */
  def probe(bytes: Array[Byte]): Either[String, Unit] =
    Try(parse(bytes)) match {
      case Success(_) => Right(())
      case Failure(e) => Left(String.valueOf(e.getMessage))
    }

  def parse(bytes: Array[Byte]): H5File = {
    require(bytes.length >= 8 && Magic.indices.forall(i => bytes(i) == Magic(i)),
      "not an HDF5 stream (missing \\x89HDF magic)")
    // distinct from the magic check: a valid-magic short stream is a cut
    // download, and the R17 skip reason should say so
    require(bytes.length >= 96,
      s"truncated HDF5 stream (${bytes.length} bytes, superblock needs 96)")
    val b = new Buf(bytes)
    val sbVer = b.u8(8)
    require(sbVer == 0 || sbVer == 1,
      s"superblock version $sbVer unsupported (subset reads v0/v1)")
    require(b.u8(13) == 8 && b.u8(14) == 8,
      s"subset requires 8-byte offsets/lengths, got ${b.u8(13)}/${b.u8(14)}")
    // v1 inserts 2+2 bytes (indexed-storage k + reserved) before the flags
    val steAt = (if (sbVer == 1) 28 else 24) + 32
    val rootOhdr = b.u64(steAt + 8)
    val root = readHeader(b, rootOhdr)
    val stab = root.stab.getOrElse(
      throw new IllegalArgumentException(
        "root group has no symbol-table message (subset reads v1 groups)"))
    val links = readGroupLinks(b, stab._1, stab._2)
    val datasets = links.map { case (name, at) =>
      val h = readHeader(b, at)
      require(h.stab.isEmpty,
        s"nested group '$name' unsupported (NetCDF-4 classic model is flat)")
      val shape = h.dataspace.getOrElse(
        throw new IllegalArgumentException(s"dataset '$name' has no dataspace"))
      val dt = h.datatype.getOrElse(
        throw new IllegalArgumentException(s"dataset '$name' has no datatype")) match {
        case Right(num) => num
        case Left(cls) => throw new IllegalArgumentException(
          s"dataset '$name' has datatype class $cls (subset reads fixed/float)")
      }
      val (addr, size, compact) = h.layout.getOrElse(
        throw new IllegalArgumentException(s"dataset '$name' has no data layout"))
      val nElems = shape.product.max(1L)
      if (compact.isEmpty && addr != Undef) {
        require(addr >= 0 && size >= 0 && addr + size <= bytes.length,
          s"dataset '$name' data [$addr,+$size) exceeds stream length ${bytes.length}")
        require(size == nElems * dt.size,
          s"dataset '$name' size $size != ${nElems}x${dt.size} elements")
      }
      H5Dataset(name, shape, dt, addr, size, compact, h.attrs)
    }
    H5File(datasets, bytes)
  }

  /** Read a whole dataset as doubles in row-major order (fill/packing is
    * [[decodeCube]]'s job; an unallocated blob reads as NaN). */
  def readValues(f: H5File, ds: H5Dataset): Array[Double] = {
    val n = ds.shape.product.max(1L).toInt
    val raw: ByteBuffer = ds.compact match {
      case Some(inline) => ByteBuffer.wrap(inline)
      case None if ds.dataAddr == Undef => return Array.fill(n)(Double.NaN)
      case None => ByteBuffer.wrap(f.bytes, ds.dataAddr.toInt, ds.dataSize.toInt)
    }
    raw.order(if (ds.dtype.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val t = ds.dtype
    Array.tabulate(n) { i =>
      if (t.float) {
        if (t.size == 4) raw.getFloat(raw.position() + i * 4).toDouble
        else raw.getDouble(raw.position() + i * 8)
      } else {
        val p = raw.position() + i * t.size
        val v: Long = t.size match {
          case 1 => raw.get(p).toLong
          case 2 => raw.getShort(p).toLong
          case 4 => raw.getInt(p).toLong
          case 8 => raw.getLong(p)
          case s => throw new IllegalArgumentException(s"fixed-point size $s")
        }
        if (t.signed || t.size == 8) v.toDouble
        else (v & ((1L << (t.size * 8)) - 1)).toDouble
      }
    }
  }

  // message-walk result for one object header
  private case class Header(
      dataspace: Option[Seq[Long]],
      datatype: Option[Either[Int, NumType]],
      layout: Option[(Long, Long, Option[Array[Byte]])],
      attrs: Seq[H5Attr],
      stab: Option[(Long, Long)])

  private def readHeader(b: Buf, addr: Long): Header = {
    require(addr >= 0 && addr + 16 <= b.bytes.length, s"object header at $addr out of range")
    val ver = b.u8(addr.toInt)
    require(ver == 1,
      s"object header version $ver unsupported (subset reads v1; " +
        "v2/OHDR is the HDF5 'latest format' libnetcdf does not emit by default)")
    val nMsgs = b.u16(addr.toInt + 2)
    var dataspace: Option[Seq[Long]] = None
    var datatype: Option[Either[Int, NumType]] = None
    var layout: Option[(Long, Long, Option[Array[Byte]])] = None
    var stab: Option[(Long, Long)] = None
    val attrs = Seq.newBuilder[H5Attr]
    var p = addr.toInt + 16 // 12-byte v1 prefix + 4 alignment pad
    var seen = 0
    while (seen < nMsgs) {
      require(p + 8 <= b.bytes.length, s"message $seen at $p out of range")
      val typ = b.u16(p)
      val sz = b.u16(p + 2)
      val body = p + 8
      require(body + sz <= b.bytes.length, s"message body at $body+$sz out of range")
      var next = body + sz
      typ match {
        case 0x0001 => dataspace = Some(parseDataspace(b, body))
        case 0x0003 => datatype = Some(parseDatatype(b, body))
        case 0x0008 => layout = Some(parseLayout(b, body))
        case 0x000C => parseAttr(b, body).foreach(attrs += _)
        case 0x0010 => next = b.u64(body).toInt // continuation block
        case 0x0011 => stab = Some((b.u64(body), b.u64(body + 8)))
        case _ => () // NIL, fill value, mtime, _NCProperties carriers, …
      }
      p = next
      seen += 1
    }
    Header(dataspace, datatype, layout, attrs.result(), stab)
  }

  private def parseDataspace(b: Buf, p: Int): Seq[Long] = {
    val ver = b.u8(p)
    val rank = b.u8(p + 1)
    val dimsAt = ver match {
      case 1 => p + 8
      case 2 => p + 4
      case v => throw new IllegalArgumentException(s"dataspace version $v unsupported")
    }
    Seq.tabulate(rank)(i => b.u64(dimsAt + i * 8))
  }

  /** Right(numeric) or Left(class id) for non-numeric (string attrs are
    * handled inline in parseAttr; vlen/reference datasets are rejected). */
  private def parseDatatype(b: Buf, p: Int): Either[Int, NumType] = {
    val cls = b.u8(p) & 0x0f
    val bits0 = b.u8(p + 1)
    val size = b.u32(p + 4).toInt
    cls match {
      case 0 => Right(NumType(float = false, size, (bits0 & 1) == 1, (bits0 & 8) != 0))
      case 1 => Right(NumType(float = true, size, (bits0 & 1) == 1, signed = true))
      case c => Left(c)
    }
  }

  private def parseLayout(b: Buf, p: Int): (Long, Long, Option[Array[Byte]]) = {
    val ver = b.u8(p)
    require(ver == 3, s"data layout version $ver unsupported (subset reads v3)")
    b.u8(p + 1) match {
      case 0 => // compact: size u16, raw data inline
        val n = b.u16(p + 2)
        (Undef, n.toLong, Some(b.bytes.slice(p + 4, p + 4 + n)))
      case 1 => (b.u64(p + 2), b.u64(p + 10), None)
      case 2 => throw new IllegalArgumentException(
        "chunked data layout unsupported (subset reads contiguous; " +
          "re-serialize without chunking/compression)")
      case c => throw new IllegalArgumentException(s"data layout class $c unsupported")
    }
  }

  /** v1/v2/v3 attribute messages. Returns None for attr datatypes outside
    * the subset (vlen `DIMENSION_LIST`, reference `REFERENCE_LIST`, …) —
    * skipped, not fatal, because axis mapping uses names + shapes. */
  private def parseAttr(b: Buf, p: Int): Option[H5Attr] = {
    val ver = b.u8(p)
    require(ver >= 1 && ver <= 3, s"attribute message version $ver unsupported")
    // v2/v3 flags: bits 0/1 mark the datatype/dataspace as SHARED-message
    // references rather than inline encodings — out of subset, skip the
    // attribute (axis mapping never depends on one)
    if (ver >= 2 && (b.u8(p + 1) & 0x03) != 0) return None
    val nameSize = b.u16(p + 2)
    val dtSize = b.u16(p + 4)
    val dsSize = b.u16(p + 6)
    val pad = (n: Int) => if (ver == 1) (n + 7) / 8 * 8 else n
    var at = p + 8 + (if (ver == 3) 1 else 0) // v3: name charset byte
    val name = b.cstr(at)
    at += pad(nameSize)
    val dtAt = at
    at += pad(dtSize)
    val dsAt = at
    at += pad(dsSize)
    val count = parseDataspace(b, dsAt).product.max(1L).toInt
    val cls = b.u8(dtAt) & 0x0f
    if (cls == 3) { // string: value bytes are the declared datatype size
      val len = b.u32(dtAt + 4).toInt
      Some(H5Attr(name, b.ascii(at, len).takeWhile(_ != '\u0000'), Nil))
    } else parseDatatype(b, dtAt) match {
      case Right(t) =>
        val bb = ByteBuffer.wrap(b.bytes, at, count * t.size)
          .order(if (t.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
        val nums = Seq.tabulate(count) { i =>
          val q = at + i * t.size
          if (t.float) { if (t.size == 4) bb.getFloat(q).toDouble else bb.getDouble(q) }
          else t.size match {
            case 1 => if (t.signed) b.bytes(q).toDouble else b.u8(q).toDouble
            case 2 => if (t.signed) bb.getShort(q).toDouble else (bb.getShort(q) & 0xffff).toDouble
            case 4 => if (t.signed) bb.getInt(q).toDouble
                      else (bb.getInt(q) & 0xffffffffL).toDouble
            case _ => bb.getLong(q).toDouble
          }
        }
        Some(H5Attr(name, "", nums))
      case Left(_) => None
    }
  }

  /** Walk the group's v1 B-tree → SNOD symbol nodes → (link name, object
    * header address), resolving names through the local heap. */
  private def readGroupLinks(b: Buf, btreeAddr: Long, heapAddr: Long): Seq[(String, Long)] = {
    require(heapAddr >= 0 && heapAddr + 32 <= b.bytes.length, "local heap out of range")
    require(b.ascii(heapAddr.toInt, 4) == "HEAP", "bad local heap signature")
    val heapData = b.u64(heapAddr.toInt + 24)

    def walk(at: Long): Seq[(String, Long)] = {
      require(at >= 0 && at + 24 <= b.bytes.length, "btree node out of range")
      b.ascii(at.toInt, 4) match {
        case "TREE" =>
          // keys/children alternate after the 24-byte node header; level-0
          // children are SNODs, higher levels are btrees — walk dispatches
          // on the signature either way
          val n = b.u16(at.toInt + 6)
          Seq.tabulate(n)(i => b.u64(at.toInt + 24 + 8 + i * 16)).flatMap(walk)
        case "SNOD" =>
          val n = b.u16(at.toInt + 6)
          Seq.tabulate(n) { i =>
            val e = at.toInt + 8 + i * 40
            (b.cstr((heapData + b.u64(e)).toInt), b.u64(e + 8))
          }
        case sig => throw new IllegalArgumentException(s"bad group node signature '$sig'")
      }
    }
    walk(btreeAddr)
  }

  private final class Buf(val bytes: Array[Byte]) {
    private val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def u8(p: Int): Int = bytes(p) & 0xff
    def u16(p: Int): Int = bb.getShort(p) & 0xffff
    def u32(p: Int): Long = bb.getInt(p) & 0xffffffffL
    def u64(p: Int): Long = bb.getLong(p)
    def ascii(p: Int, n: Int): String = new String(bytes, p, n, US_ASCII)
    def cstr(p: Int): String = {
      var e = p
      while (e < bytes.length && bytes(e) != 0) e += 1
      new String(bytes, p, e - p, US_ASCII)
    }
  }

  // -- CF cube decode → long-format DataFrame -------------------------

  private val TimeNames = Set("time", "t")
  private val XNames = Set("x", "lon", "longitude")
  private val YNames = Set("y", "lat", "latitude")
  private def coordNames = TimeNames ++ XNames ++ YNames

  /** Decode staged NetCDF-4 cube bytes to the pipeline's long format —
    * schema- and semantics-identical to [[NetCdf.decodeCube]] (shared
    * [[NetCdf.cubeFrame]] builder): same data-variable selection, CF time
    * units, packing and fill masking. Axis positions resolve by matching
    * coordinate-dataset lengths against the data shape (conventional
    * (time, y, x) order on ties) because the subset skips the vlen
    * `DIMENSION_LIST` attribute. */
  def decodeCube(
      spark: SparkSession, collection: String, parameter: String,
      bytes: Array[Byte]): DataFrame = {
    val f = parse(bytes)
    val gridded = f.datasets.filter(d =>
      !coordNames.contains(d.name.toLowerCase) && d.shape.size >= 2)
    require(gridded.nonEmpty, "no gridded data variable in NetCDF-4 stream")
    gridded.find(_.name.equalsIgnoreCase(parameter)).foreach { v =>
      require(v.shape.size <= 3,
        s"variable '$parameter' has rank ${v.shape.size}; decodeCube " +
          "supports rank 2 (y,x) and rank 3 (time,y,x)")
    }
    val candidates = gridded.filter(_.shape.size <= 3)
    require(candidates.nonEmpty,
      s"only rank-${gridded.map(_.shape.size).max} data variables " +
        "present; decodeCube supports rank 2 (y,x) and rank 3 (time,y,x)")
    val data = candidates
      .sortBy(v => (if (v.name.equalsIgnoreCase(parameter)) 0 else 1, -v.shape.size))
      .head
    val rank = data.shape.size
    val shape = data.shape.map(_.toInt)

    def coord(names: Set[String]): Option[H5Dataset] =
      f.datasets.find(d => d.shape.size == 1 && names.contains(d.name.toLowerCase))
    val timeDs = if (rank == 3) coord(TimeNames) else None
    val yDs = coord(YNames)
    val xDs = coord(XNames)

    // Axis positions: every permutation consistent with the real coords'
    // lengths, preferring conventional (time, y, x) order — shape ties
    // (e.g. a square grid) resolve conventionally rather than failing.
    val axes: Seq[(Option[H5Dataset], Int)] = // (coord, conventional position)
      (timeDs, yDs, xDs) match {
        case _ if rank == 2 => Seq((yDs, 0), (xDs, 1))
        case _ => Seq((timeDs, 0), (yDs, 1), (xDs, 2))
      }
    val perm = (0 until rank).permutations
      .map(ps => ps.zip(axes))
      .find(_.forall { case (pos, (ds, conv)) =>
        ds.forall(_.shape.head == shape(pos)) && (ds.nonEmpty || pos == conv)
      })
      .getOrElse(throw new IllegalArgumentException(
        s"coordinate lengths do not match data shape ${shape.mkString("x")}"))
      .map(_._1)
    val (tPos, yPos, xPos) =
      if (rank == 2) (None, perm(0), perm(1)) else (Some(perm(0)), perm(1), perm(2))

    val strides = Array.fill(rank)(1)
    var s = rank - 2
    while (s >= 0) { strides(s) = strides(s + 1) * shape(s + 1); s -= 1 }

    def vals(ds: Option[H5Dataset], pos: Int): Array[Double] =
      ds.map(readValues(f, _)).getOrElse(Array.tabulate(shape(pos))(_.toDouble))
    val timeVals = tPos.map(p => vals(timeDs, p)).getOrElse(Array(0.0))
    val yVals = vals(yDs, yPos)
    val xVals = vals(xDs, xPos)

    val toEpochSec: Double => Double =
      timeDs.flatMap(_.attr("units")).map(_.text) match {
        case Some(u) if u.contains(" since ") => NetCdf.cfTimeToEpochSeconds(u)
        case _ => identity
      }
    val scale = data.attr("scale_factor").flatMap(_.first).getOrElse(1.0)
    val offset = data.attr("add_offset").flatMap(_.first).getOrElse(0.0)
    val fill = data.attr("_FillValue").orElse(data.attr("missing_value")).flatMap(_.first)

    NetCdf.cubeFrame(spark, collection, parameter, timeVals, yVals, xVals,
      readValues(f, data),
      tPos.map(strides(_)).getOrElse(0), strides(yPos), strides(xPos),
      scale, offset, fill, toEpochSec)
  }

  // -- writer (fixture + sink side) -----------------------------------

  /** A dataset to write. `values` are row-major doubles, narrowed to
    * float32 when `f32`; attrs accept String / Double / Float / Int. */
  case class WriteDs(
      name: String, shape: Seq[Long], values: Array[Double],
      f32: Boolean = false, attrs: Seq[(String, Any)] = Nil)

  /** Serialize the subset: superblock v0, one flat symbol-table root
    * group, v1 object headers, contiguous little-endian data. Layout is
    * computed in one forward pass (every block's size is known before
    * its address is needed). */
  def write(datasets: Seq[WriteDs]): Array[Byte] = {
    require(datasets.nonEmpty, "empty HDF5 file")
    // the superblock declares group-leaf K=4, which caps one symbol node
    // at 2K=8 entries; a flat cube needs 4 (time/y/x/data), so one SNOD
    // suffices — reject rather than emit a spec-violating oversized node
    require(datasets.size <= 8,
      s"writer subset emits one symbol node (max 8 datasets), got ${datasets.size}")
    val sorted = datasets.sortBy(_.name) // SNOD entries are name-ordered
    // local heap data segment: offset 0 is the conventional empty string
    val nameOffsets = scala.collection.mutable.Map[String, Long]()
    val heapData = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(new Array[Byte](8)) // "" at offset 0 for the root entry
      sorted.foreach { d =>
        nameOffsets(d.name) = o.size().toLong
        val nb = d.name.getBytes(US_ASCII)
        o.write(nb, 0, nb.length)
        o.write(0) // NUL terminator
        while (o.size() % 8 != 0) o.write(0)
      }
      o.toByteArray
    }

    val sbSize = 96L
    val rootOhdrAt = sbSize
    val rootOhdr = ohdrBytes(Seq(msg(0x0011, new Array[Byte](16)))) // patched later
    val btreeAt = rootOhdrAt + rootOhdr.length
    val btreeSize = 24L + 8 + 16 // header + key0 + (child0, key1)
    val heapAt = btreeAt + btreeSize
    val heapHdrSize = 32L
    val heapDataAt = heapAt + heapHdrSize
    val snodAt = heapDataAt + heapData.length
    val snodSize = 8L + 40L * sorted.size

    // dataset object headers: size-stable w.r.t. the data address, so
    // measure with a placeholder then re-emit with the real address
    def dsOhdr(d: WriteDs, dataAddr: Long): Array[Byte] = {
      val n = d.shape.product.max(1L)
      val elem = if (d.f32) 4 else 8
      ohdrBytes(
        Seq(
          msg(0x0001, dataspaceBody(d.shape)),
          msg(0x0003, datatypeBody(d.f32)),
          msg(0x0008, layoutBody(dataAddr, n * elem))) ++
          d.attrs.map { case (an, av) => msg(0x000C, attrBody(an, av)) })
    }
    val ohdrSizes = sorted.map(d => dsOhdr(d, 0L).length.toLong)
    val ohdrAts = ohdrSizes.scanLeft(snodAt + snodSize)(_ + _).init
    var dataAt = (snodAt + snodSize + ohdrSizes.sum + 7) / 8 * 8
    val dataAts = sorted.map { d =>
      val at = dataAt
      dataAt += (d.shape.product.max(1L) * (if (d.f32) 4 else 8) + 7) / 8 * 8
      at
    }
    val eof = dataAt

    val out = ByteBuffer.allocate(eof.toInt).order(ByteOrder.LITTLE_ENDIAN)
    // superblock v0
    out.put(Magic)
    out.put(Array[Byte](0, 0, 0, 0, 0, 8, 8, 0)) // versions, offset/length sizes
    out.putShort(4.toShort).putShort(16.toShort) // group leaf / internal k
    out.putInt(0) // consistency flags
    out.putLong(0L).putLong(Undef).putLong(eof).putLong(Undef)
    out.putLong(0L) // root STE: link name offset ("" at heap 0)
    out.putLong(rootOhdrAt)
    out.putInt(0).putInt(0) // cache type, reserved
    out.putLong(0L).putLong(0L) // scratch
    // root object header (symbol-table message → btree + heap)
    out.position(rootOhdrAt.toInt)
    val stabBody = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(btreeAt).putLong(heapAt).array()
    out.put(ohdrBytes(Seq(msg(0x0011, stabBody))))
    // group b-tree: one leaf with one SNOD child
    out.position(btreeAt.toInt)
    out.put("TREE".getBytes(US_ASCII)).put(0.toByte).put(0.toByte)
    out.putShort(1.toShort).putLong(Undef).putLong(Undef)
    out.putLong(0L) // key0: lowest name offset
    out.putLong(snodAt) // child0
    out.putLong(nameOffsets(sorted.last.name)) // key1: highest name offset
    // local heap
    out.position(heapAt.toInt)
    out.put("HEAP".getBytes(US_ASCII)).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    out.putLong(heapData.length.toLong).putLong(Undef).putLong(heapDataAt)
    out.put(heapData)
    // SNOD
    out.position(snodAt.toInt)
    out.put("SNOD".getBytes(US_ASCII)).put(1.toByte).put(0.toByte)
    out.putShort(sorted.size.toShort)
    sorted.zip(ohdrAts).foreach { case (d, at) =>
      out.putLong(nameOffsets(d.name)).putLong(at)
      out.putInt(0).putInt(0).putLong(0L).putLong(0L)
    }
    // dataset headers + data
    sorted.lazyZip(ohdrAts).lazyZip(dataAts).foreach { (d, hdrAt, dAt) =>
      out.position(hdrAt.toInt)
      out.put(dsOhdr(d, dAt))
      out.position(dAt.toInt)
      d.values.foreach(v => if (d.f32) out.putFloat(v.toFloat) else out.putDouble(v))
    }
    out.array()
  }

  // one v1 header message: type, padded size, flags, reserved + body
  private def msg(typ: Int, body: Array[Byte]): Array[Byte] = {
    val padded = (body.length + 7) / 8 * 8
    val o = ByteBuffer.allocate(8 + padded).order(ByteOrder.LITTLE_ENDIAN)
    o.putShort(typ.toShort).putShort(padded.toShort)
    o.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    o.put(body)
    o.array()
  }

  private def ohdrBytes(msgs: Seq[Array[Byte]]): Array[Byte] = {
    val size = msgs.map(_.length).sum
    val o = ByteBuffer.allocate(16 + size).order(ByteOrder.LITTLE_ENDIAN)
    o.put(1.toByte).put(0.toByte).putShort(msgs.size.toShort)
    o.putInt(1).putInt(size).putInt(0) // refcount, header size, align pad
    msgs.foreach(o.put)
    o.array()
  }

  private def dataspaceBody(shape: Seq[Long]): Array[Byte] = {
    val o = ByteBuffer.allocate(8 + shape.size * 8).order(ByteOrder.LITTLE_ENDIAN)
    o.put(1.toByte).put(shape.size.toByte).put(0.toByte)
    o.put(0.toByte).putInt(0)
    shape.foreach(o.putLong)
    o.array()
  }

  private def datatypeBody(f32: Boolean): Array[Byte] = {
    val size = if (f32) 4 else 8
    val o = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    o.put(0x11.toByte) // version 1, class 1 (float)
    // bit field 0: LE byte order, IEEE msb-set mantissa norm (0x20);
    // bit field 1: sign bit location (31 for f32, 63 for f64)
    o.put(0x20.toByte).put((if (f32) 31 else 63).toByte).put(0.toByte)
    o.putInt(size)
    o.putShort(0.toShort).putShort((size * 8).toShort) // bit offset, precision
    if (f32) { o.put(23.toByte).put(8.toByte).put(0.toByte).put(23.toByte).putInt(127) }
    else { o.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte).putInt(1023) }
    o.array()
  }

  private def layoutBody(addr: Long, size: Long): Array[Byte] = {
    val o = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
    o.put(3.toByte).put(1.toByte).putLong(addr).putLong(size)
    o.array()
  }

  private def attrBody(name: String, value: Any): Array[Byte] = {
    val pad8 = (n: Int) => (n + 7) / 8 * 8
    val nb = name.getBytes(US_ASCII) :+ 0.toByte
    val (dt, data) = value match {
      case s: String =>
        val vb = s.getBytes(US_ASCII)
        val o = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        o.put(0x13.toByte).put(0.toByte).put(0.toByte).put(0.toByte) // string, NUL-pad
        o.putInt(vb.length)
        (o.array(), vb)
      case d: Double =>
        (datatypeBody(f32 = false),
          ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(d).array())
      case fv: Float =>
        (datatypeBody(f32 = true),
          ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putFloat(fv).array())
      case i: Int =>
        val o = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
        o.put(0x10.toByte).put(0x08.toByte).put(0.toByte).put(0.toByte) // fixed, LE signed
        o.putInt(4).putShort(0.toShort).putShort(32.toShort)
        (o.array(), ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array())
      case other => throw new IllegalArgumentException(s"attr type $other")
    }
    val ds = dataspaceBody(Nil) // scalar
    val o = ByteBuffer.allocate(8 + pad8(nb.length) + pad8(dt.length) + pad8(ds.length) + data.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    o.put(1.toByte).put(0.toByte)
    o.putShort(nb.length.toShort).putShort(dt.length.toShort).putShort(ds.length.toShort)
    o.put(nb).position(o.position() + pad8(nb.length) - nb.length)
    o.put(dt).position(o.position() + pad8(dt.length) - dt.length)
    o.put(ds).position(o.position() + pad8(ds.length) - ds.length)
    o.put(data)
    o.array()
  }

  /** Encode a long-format cube to NetCDF-4 bytes — the HDF5-container
    * dual of [[NetCdf.encodeCube]] (same input contract, edge-sized by
    * the same argument): float64 data laid out (time, y, x) contiguous,
    * double coordinates, CF epoch-seconds time units, nulls as NaN so
    * encode∘decode is the identity on defined cells. */
  def encodeCube(df: DataFrame, parameter: String): Array[Byte] = {
    import org.apache.spark.sql.functions.col
    val rows = df.select(col("time"), col("x"), col("y"), col("value")).collect()
    require(rows.nonEmpty, "empty cube")
    val times = rows.map(_.getTimestamp(0).getTime).distinct.sorted
    val xs = rows.map(_.getDouble(1)).distinct.sorted
    val ys = rows.map(_.getDouble(2)).distinct.sorted
    val tIdx = times.zipWithIndex.toMap
    val xIdx = xs.zipWithIndex.toMap
    val yIdx = ys.zipWithIndex.toMap
    val grid = Array.fill(times.length * ys.length * xs.length)(Double.NaN)
    rows.foreach { r =>
      val at = (tIdx(r.getTimestamp(0).getTime) * ys.length + yIdx(r.getDouble(2))) *
        xs.length + xIdx(r.getDouble(1))
      grid(at) = if (r.isNullAt(3)) Double.NaN else r.getDouble(3)
    }
    write(Seq(
      WriteDs("time", Seq(times.length.toLong), times.map(_ / 1000.0),
        attrs = Seq("units" -> "seconds since 1970-01-01 00:00:00")),
      WriteDs("y", Seq(ys.length.toLong), ys),
      WriteDs("x", Seq(xs.length.toLong), xs),
      WriteDs(parameter,
        Seq(times.length.toLong, ys.length.toLong, xs.length.toLong), grid)))
  }
}
