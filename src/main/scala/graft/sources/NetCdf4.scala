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
  * by default-configuration libnetcdf/libhdf5 — including the chunked,
  * deflate-compressed layout it emits for cube-sized variables —
  *   - superblock versions 0-3 (v2/v3 is the "latest format" fixed
  *     48-byte superblock, lookup3-checksummed), 8-byte offsets/lengths;
  *   - version-1 object headers (with continuation blocks) AND
  *     version-2 "OHDR" headers (1-byte message types, checksummed
  *     chunks, OCHK continuations) — the `libver='latest'` framing;
  *     groups via symbol tables (v1 B-tree + local heap) or compact
  *     hard-link messages, NESTED to depth 8 with path-prefixed
  *     dataset names (r18 — see the traversal note below);
  *   - dataspace v1/v2, fixed-point and IEEE-float datatypes in either
  *     byte order, data layout v3 contiguous, compact, or CHUNKED
  *     (version-1 chunk B-tree index) with the deflate, shuffle, and
  *     fletcher32 filters (`java.util.zip.Inflater` covers deflate;
  *     shuffle is a byte de-interleave; fletcher32 checksums verify and
  *     strip) — the default libnetcdf output for cube-sized variables,
  *     which chunks and commonly deflate-compresses;
  *   - data layout v4 — the `libver='latest'` CHUNK INDEXES:
  *     single-chunk (filtered and not), implicit, and FIXED ARRAY
  *     (FAHD/FADB, lookup3-checksummed, filtered and unfiltered
  *     clients) for fixed-maxdim datasets — the layouts current libhdf5
  *     emits for a forecast cube under the latest file format (VERDICT
  *     r15 #5) — plus the EXTENSIBLE ARRAY (EAHD/EAIB/EASB/EADB), the
  *     index libhdf5 picks for one UNLIMITED maxdim: a growing forecast
  *     archive's appendable time axis (VERDICT r16 #4; the unlimited
  *     dim must be dim 0 — H5Dearray swizzles chunk order otherwise,
  *     and a non-leading unlimited axis rejects by name), including
  *     PAGED data blocks (the past-~65k-chunk archive shape at default
  *     creation parameters: super-block page-init bitmaps, prefix-only
  *     data blocks, per-page checksums — r18) — and the
  *     V2 B-TREE (BTHD/BTIN/BTLF, several unlimited maxdims, e.g.
  *     appendable time AND ensemble axes) at ANY depth — BTIN
  *     internal-node traversal included (VERDICT r17 #4);
  *   - v1/v2/v3 attribute messages with string and numeric scalars/
  *     arrays — the CF attributes a forecast cube uses (`units`,
  *     `scale_factor`, `add_offset`, `_FillValue`) — plus the
  *     vlen-of-object-reference `DIMENSION_LIST` (r19): axis mapping
  *     resolves through netCDF-4's dimension scales the way
  *     `xarray.open_dataset` does, global-heap-stored references
  *     included, so a cube whose coordinate variables are RENAMED
  *     (leaf names matching none of time/y/x) still decodes with the
  *     right axes; `REFERENCE_LIST` (vlen of compound) keeps its named
  *     skip, and files without `DIMENSION_LIST` fall back to
  *     coordinate names + shape matching, the same convention
  *     [[NetCdf.decodeCube]] applies.
  * NESTED GROUPS are traversed (r18): a grouped product's variable
  * reads under its path ("grp/var", xarray's group addressing minus
  * the leading slash), for both v1 symbol-table and latest-format
  * link-message groups, with named rejections for hard-link cycles
  * and nesting beyond depth 8. DENSE storage is read too (r18): past
  * max_compact (default 8) a latest-format group's LINKS and an
  * object's ATTRIBUTES live as managed objects in fractal heaps
  * enumerated via name-index v2 B-trees — the many-variable and
  * many-attribute `libver='latest'` shapes ([[readDenseLinks]],
  * [[readDenseAttrs]]; the latter guards the silent-CF-attribute-loss
  * failure mode, not just a skip).
  * Filters beyond deflate/shuffle/fletcher32 (szip, nbit, scaleoffset,
  * …), extensible arrays whose unlimited maxdim is not the
  * slowest-varying, paged extensible-array data blocks addressed from
  * the INDEX block (impossible at libhdf5's default creation
  * parameters — the page-init bitmap lives in the owning super block),
  * and fractal heaps with filtered/huge/tiny objects or indirect child
  * rows are rejected with a message naming the feature;
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

  /** Attribute: string attrs carry `text`, numeric attrs carry `nums`;
    * vlen-of-object-reference attrs (netCDF-4's `DIMENSION_LIST`) carry
    * `refs` — per dataspace element, the referenced object-header
    * addresses resolved through the global heap. */
  case class H5Attr(name: String, text: String, nums: Seq[Double],
                    refs: Seq[Seq[Long]] = Nil) {
    def first: Option[Double] = nums.headOption
  }

  /** One filter-pipeline entry (message 0x000B): id 1 = deflate, 2 =
    * shuffle, 3 = fletcher32; `cdata` is the client-data array (deflate
    * level / shuffle element size; fletcher32 carries none). */
  case class H5Filter(id: Int, cdata: Seq[Int])

  /** A version-4 ("latest format") chunk index: `dims` include the
    * trailing element-size dim like the v3 `chunk` tuple's. `idxType`
    * 1 = single chunk (addr is the chunk blob; `singleFiltered` carries
    * (filtered size, filter mask) when the layout's filtered-single-
    * chunk flag is set), 2 = implicit (unfiltered chunks contiguous at
    * addr in row-major grid order), 3 = fixed array (addr is the FAHD
    * header), 4 = extensible array (addr is the EAHD header — the
    * one-UNLIMITED-maxdim index of a growing time axis), 5 = v2 B-tree
    * (addr is the BTHD header — several unlimited maxdims; read at any
    * depth via BTIN internal-node traversal). */
  case class Chunk4(idxType: Int, addr: Long, dims: Seq[Int],
                    pageBits: Int = 0,
                    singleFiltered: Option[(Long, Long)] = None)

  /** One dataset (= one NetCDF-4 variable). `compact` holds inline data
    * for layout class 0; `chunk` holds (chunk-B-tree address, chunk dims
    * incl. the trailing element-size dim) for layout v3 class 2; `chunk4`
    * holds the latest-format chunk index for layout v4 class 2; otherwise
    * `dataAddr`/`dataSize` locate the contiguous blob (`dataAddr ==
    * Undef` → never written → all-fill). `filters` is the write-order
    * filter pipeline applied to each chunk. */
  case class H5Dataset(
      name: String, shape: Seq[Long], dtype: NumType,
      dataAddr: Long, dataSize: Long, compact: Option[Array[Byte]],
      attrs: Seq[H5Attr],
      chunk: Option[(Long, Seq[Int])] = None,
      filters: Seq[H5Filter] = Nil,
      chunk4: Option[Chunk4] = None,
      // the dataset's own object-header address — the identity an
      // object REFERENCE (DIMENSION_LIST) resolves against
      headerAddr: Long = Undef) {
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
    require(bytes.length >= 48,
      s"truncated HDF5 stream (${bytes.length} bytes, superblock needs 48)")
    val b = new Buf(bytes)
    val sbVer = b.u8(8)
    val rootOhdr = sbVer match {
      case 0 | 1 =>
        require(bytes.length >= 96,
          s"truncated HDF5 stream (${bytes.length} bytes, v$sbVer superblock needs 96)")
        require(b.u8(13) == 8 && b.u8(14) == 8,
          s"subset requires 8-byte offsets/lengths, got ${b.u8(13)}/${b.u8(14)}")
        // v1 inserts 2+2 bytes (indexed-storage k + reserved) before the flags
        val steAt = (if (sbVer == 1) 28 else 24) + 32
        b.u64(steAt + 8)
      case 2 | 3 =>
        // the "latest format" superblock: fixed 48-byte layout, lookup3
        // checksummed; the root group address sits directly in it
        require(b.u8(9) == 8 && b.u8(10) == 8,
          s"subset requires 8-byte offsets/lengths, got ${b.u8(9)}/${b.u8(10)}")
        checkLookup3(b, 0, 44, "superblock")
        b.u64(36)
      case v => throw new IllegalArgumentException(
        s"superblock version $v unsupported (subset reads v0-v3)")
    }
    val root = readHeader(b, rootOhdr)
    val links = root.stab match {
      case Some((bt, hp)) => readGroupLinks(b, bt, hp)
      case None => root.dense match {
        case Some((fh, bt2)) => readDenseLinks(b, fh, bt2)
        case None =>
          require(root.links.nonEmpty,
            "root group has neither a symbol-table message nor link storage")
          root.links.sortBy(_._1)
      }
    }
    val datasets = collectDatasets(b, links, "", Set(rootOhdr), 0)
    H5File(datasets, bytes)
  }

  /** Depth-first dataset collection across NESTED GROUPS: a child that
    * is itself a group — a v1 symbol-table header, or a new-style
    * header carrying link/link-info/group-info messages — recurses with
    * its name as a path prefix, so a grouped product's variable reads
    * as `"grp/var"` (xarray's `group=` addressing, minus the leading
    * slash; root-level names are unchanged). Children come from the
    * symbol table, the DENSE fractal-heap store ([[readDenseLinks]] —
    * [[parseLinkInfo]] routes there, so a dense group never reads as
    * empty), or the compact link messages. Hard-link cycles and nesting
    * beyond depth 8 reject by name. */
  private def collectDatasets(b: Buf, links: Seq[(String, Long)],
      prefix: String, visited: Set[Long], depth: Int): Seq[H5Dataset] =
    links.flatMap { case (short, addr) =>
      val name = prefix + short
      val h = readHeader(b, addr)
      val isGroup = h.stab.isDefined || h.links.nonEmpty || h.dense.isDefined ||
        (h.groupish && h.dataspace.isEmpty)
      if (isGroup) {
        require(depth < 8, s"group '$name' nested beyond depth 8")
        require(!visited.contains(addr), s"group '$name' closes a hard-link cycle")
        val children = h.stab match {
          case Some((bt, hp)) => readGroupLinks(b, bt, hp)
          case None => h.dense match {
            case Some((fh, bt2)) => readDenseLinks(b, fh, bt2)
            case None => h.links.sortBy(_._1)
          }
        }
        collectDatasets(b, children, name + "/", visited + addr, depth + 1)
      } else Seq(datasetOf(b, name, h).copy(headerAddr = addr))
    }

  /** One dataset from its walked header: dataspace/datatype/layout
    * validation, the edge-decode budget, and the per-layout rejections. */
  private def datasetOf(b: Buf, name: String, h: Header): H5Dataset = {
    val bytes = b.bytes
    // compact attribute messages + any DENSE-stored ones (the >8-attr
    // latest-format shape — see readDenseAttrs)
    val attrs = h.attrs ++ h.denseAttrs
      .map { case (fh, bt) => readDenseAttrs(b, fh, bt) }.getOrElse(Nil);
    {
      val (shape, maxDims) = h.dataspace.getOrElse(
        throw new IllegalArgumentException(s"dataset '$name' has no dataspace"))
      val dt = h.datatype.getOrElse(
        throw new IllegalArgumentException(s"dataset '$name' has no datatype")) match {
        case Right(num) => num
        case Left(cls) => throw new IllegalArgumentException(
          s"dataset '$name' has datatype class $cls (subset reads fixed/float)")
      }
      val nElems = shape.product.max(1L)
      // Edge-decode budget: the codec materializes one cube in memory
      // (it decodes a single staged HTTP response), so the DECLARED
      // element count is bounded by what the stream could possibly carry
      // (deflate tops out near 1000:1) with a 2^28 hard ceiling — a
      // corrupted/hostile dataspace demanding a multi-GiB allocation
      // rejects here by name instead of OOMing the JVM (found by the
      // chunked-fixture fuzz: mutated shape dims reached readValues'
      // output allocation before any data-presence check).
      val budget = math.min(1L << 28,
        math.max(1L << 20, 1024L * bytes.length / dt.size.max(1)))
      require(nElems <= budget,
        s"dataset '$name' declares $nElems elements, beyond the " +
          s"edge-decode budget $budget for a ${bytes.length}-byte stream")
      val layout = h.layout.getOrElse(
        throw new IllegalArgumentException(s"dataset '$name' has no data layout"))
      layout match {
        case LayoutCompact(inline) =>
          H5Dataset(name, shape, dt, Undef, inline.length.toLong, Some(inline), attrs)
        case LayoutContiguous(addr, size) =>
          if (addr != Undef) {
            checkedAt(addr, size, bytes.length, s"dataset '$name' data")
            require(size == nElems * dt.size,
              s"dataset '$name' size $size != ${nElems}x${dt.size} elements")
          }
          H5Dataset(name, shape, dt, addr, size, None, attrs)
        case LayoutChunked(btree, dims) =>
          validateChunkDims(name, shape, dt, dims, h.filters)
          if (btree != Undef) checkedAt(btree, 24, bytes.length, s"dataset '$name' chunk btree")
          H5Dataset(name, shape, dt, Undef, 0L, None, attrs,
            chunk = Some((btree, dims)), filters = h.filters)
        case LayoutChunked4(c4) =>
          validateChunkDims(name, shape, dt, c4.dims, h.filters)
          if (c4.idxType == 2) require(h.filters.isEmpty,
            s"dataset '$name' implicit chunk index with a filter pipeline " +
              "(implicit indexes address unfiltered chunks)")
          if (c4.idxType == 4) {
            // H5Dearray linearizes chunk coordinates SWIZZLED (unlimited
            // dim first) when the unlimited maxdim is not dim 0; the
            // reader's element-i = row-major-cell-i mapping only holds
            // for a leading unlimited axis (the growing-time-archive
            // shape), so a non-leading unlimited dim must reject by name
            // rather than silently scatter chunks into the wrong cells.
            val unlim = maxDims.zipWithIndex.collect {
              case (m, i) if m == Undef => i }
            require(unlim.forall(_ == 0),
              s"dataset '$name' extensible-array chunk index with unlimited " +
                s"dimension(s) ${unlim.mkString(",")} not leading (H5Dearray " +
                "swizzles chunk order; subset reads dim-0-unlimited only)")
          }
          if (c4.addr != Undef) {
            val minBytes = if (c4.idxType == 3) 28L else 1L
            checkedAt(c4.addr, minBytes, bytes.length, s"dataset '$name' chunk index")
          }
          H5Dataset(name, shape, dt, Undef, 0L, None, attrs,
            filters = h.filters, chunk4 = Some(c4))
      }
    }
  }

  private def filterName(id: Int): String = id match {
    case 4 => " (szip)"
    case 5 => " (nbit)"
    case 6 => " (scaleoffset)"
    case _ => ""
  }

  /** Shared chunk-dimension/filter validation for v3 and v4 chunked
    * layouts: rank+1 dims with the element size trailing, positive chunk
    * dims, a ≤2 GiB chunk buffer (overflow-proof product: 32 hostile
    * dims of Int.MaxValue can wrap a plain Long product past the
    * ceiling, so multiplyExact and treat overflow as the rejection),
    * and the deflate/shuffle/fletcher32 filter subset. */
  private def validateChunkDims(name: String, shape: Seq[Long], dt: NumType,
                                dims: Seq[Int], filters: Seq[H5Filter]): Unit = {
    require(dims.size == shape.size + 1,
      s"dataset '$name' chunk dimensionality ${dims.size} != rank+1 " +
        s"(${shape.size + 1})")
    require(dims.last == dt.size,
      s"dataset '$name' chunk element size ${dims.last} != datatype size ${dt.size}")
    require(dims.init.forall(_ > 0), s"dataset '$name' has a zero chunk dimension")
    val chunkBytes =
      try dims.init.map(_.toLong).foldLeft(dt.size.toLong)(Math.multiplyExact)
      catch { case _: ArithmeticException => Long.MaxValue }
    require(chunkBytes <= Int.MaxValue,
      s"dataset '$name' chunk buffer exceeds 2 GiB")
    filters.foreach(f => require(f.id >= 1 && f.id <= 3,
      s"dataset '$name' filter ${f.id}${filterName(f.id)} unsupported " +
        "(subset reads deflate(1)/shuffle(2)/fletcher32(3))"))
  }

  /** Read a whole dataset as doubles in row-major order (fill/packing is
    * [[decodeCube]]'s job; an unallocated blob/btree reads as NaN). */
  def readValues(f: H5File, ds: H5Dataset): Array[Double] = {
    val n = ds.shape.product.max(1L).toInt
    ds.chunk match {
      case Some((btree, dims)) => return readChunked(f, ds, btree, dims, n)
      case None => ()
    }
    ds.chunk4 match {
      case Some(c4) => return readChunked4(f, ds, c4, n)
      case None => ()
    }
    val raw: ByteBuffer = ds.compact match {
      case Some(inline) => ByteBuffer.wrap(inline)
      case None if ds.dataAddr == Undef => return Array.fill(n)(Double.NaN)
      case None => ByteBuffer.wrap(f.bytes, ds.dataAddr.toInt, ds.dataSize.toInt)
    }
    raw.order(if (ds.dtype.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    Array.tabulate(n)(i => readElem(raw, raw.position(), i, ds.dtype))
  }

  /** Element `i` of a raw buffer starting at `base`, as a double. */
  private def readElem(raw: ByteBuffer, base: Int, i: Int, t: NumType): Double =
    if (t.float) {
      if (t.size == 4) raw.getFloat(base + i * 4).toDouble
      else raw.getDouble(base + i * 8)
    } else {
      val p = base + i * t.size
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

  /** Chunked read: walk the version-1 chunk B-tree (node type 1; level-0
    * children address the chunk blobs, higher levels address child
    * nodes), reverse each chunk's filter pipeline, and scatter its
    * elements into the row-major output — edge chunks extend past the
    * dataset bounds and their overhang is skipped. Regions no chunk
    * covers stay NaN (HDF5's unwritten-chunk fill semantics; CF fill
    * masking downstream is [[decodeCube]]'s job). The per-chunk filter
    * mask bit i set means pipeline entry i was SKIPPED for that chunk. */
  /** Shared chunk geometry + scatter for the v1-B-tree and v4 index
    * readers: row-major strides for the dataset and one chunk, the
    * filter-pipeline reversal, and the scatter of one decoded chunk into
    * the row-major output (edge-chunk overhang skipped). */
  private final class ChunkGeom(ds: H5Dataset, dims: Seq[Int], out: Array[Double]) {
    val rank: Int = ds.shape.size
    val shape: Array[Int] = ds.shape.map(_.toInt).toArray
    val chunkDims: Array[Int] = dims.init.toArray
    val elem: Int = dims.last
    val chunkElems: Int = chunkDims.product
    val strides: Array[Int] = Array.fill(rank)(1)
    private val cStrides: Array[Int] = Array.fill(rank)(1)
    locally {
      var d = rank - 2
      while (d >= 0) {
        strides(d) = strides(d + 1) * shape(d + 1)
        cStrides(d) = cStrides(d + 1) * chunkDims(d + 1)
        d -= 1
      }
    }
    /** Chunk-grid cell count per dimension. */
    val grid: Array[Long] =
      ds.shape.toArray.zip(chunkDims).map { case (s, c) => (s + c - 1) / c }

    /** Reverse the write-order pipeline on one chunk's raw bytes; mask
      * bit i set means pipeline entry i was SKIPPED for that chunk.
      * +8 slack: upstream filters may still carry small per-chunk
      * overhead (fletcher32's 4-byte checksum) at this point. */
    def defilterChain(raw0: Array[Byte], mask: Long): Array[Byte] = {
      var raw = raw0
      ds.filters.zipWithIndex.reverse.foreach { case (flt, fi) =>
        if ((mask & (1L << fi)) == 0)
          raw = defilter(flt, raw, elem, chunkElems * elem + 8)
      }
      raw
    }

    def scatter(offs: Array[Long], raw: Array[Byte]): Unit = {
      require(raw.length == chunkElems * elem,
        s"chunk decodes to ${raw.length} bytes, expected ${chunkElems}x$elem")
      val bb = ByteBuffer.wrap(raw)
        .order(if (ds.dtype.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
      var ci = 0
      while (ci < chunkElems) {
        // local chunk coords → absolute coords; skip edge-chunk overhang
        var rem = ci
        var lin = 0L
        var inBounds = true
        var k = 0
        while (k < rank && inBounds) {
          val local = rem / cStrides(k)
          rem %= cStrides(k)
          val abs = offs(k) + local
          if (abs >= shape(k)) inBounds = false
          else lin += abs * strides(k)
          k += 1
        }
        if (inBounds) out(lin.toInt) = readElem(bb, 0, ci, ds.dtype)
        ci += 1
      }
    }
  }

  private def readChunked(
      f: H5File, ds: H5Dataset, btree: Long, dims: Seq[Int], n: Int): Array[Double] = {
    val out = Array.fill(n)(Double.NaN)
    if (btree == Undef) return out
    val b = new Buf(f.bytes)
    val g = new ChunkGeom(ds, dims, out)
    val rank = g.rank
    val keySize = 8 + 8 * dims.size // chunk size + filter mask + D offsets

    // a well-formed index addresses exactly the chunk-grid cells; a
    // crafted one with duplicated/cyclic child pointers could otherwise
    // spin nEnt^depth node visits inside the depth cap (review finding)
    val maxEntries = g.grid.product.max(1L) * 2 + 64
    var visited = 0L
    def visit(addr: Long, depth: Int = 0): Unit = {
      require(depth < 32, "chunk btree deeper than 32 levels (cycle or corruption)")
      val at = checkedAt(addr, 24L + keySize, b.bytes.length, "chunk btree node")
      require(b.ascii(at, 4) == "TREE", "bad chunk btree node signature")
      require(b.u8(at + 4) == 1, s"btree node type ${b.u8(at + 4)} inside a chunk index")
      val level = b.u8(at + 5)
      val nEnt = b.u16(at + 6)
      checkedAt(addr + 24, (keySize + 8).toLong * nEnt + keySize, b.bytes.length,
        "chunk btree entries")
      visited += nEnt
      require(visited <= maxEntries,
        s"chunk btree addresses $visited entries for a $maxEntries-cell grid " +
          "(cycle or corruption)")
      var i = 0
      while (i < nEnt) {
        val keyAt = at + 24 + i * (keySize + 8)
        val child = b.u64(keyAt + keySize)
        if (level > 0) visit(child, depth + 1)
        else {
          val csize = b.u32(keyAt).toInt
          val mask = b.u32(keyAt + 4)
          val offs = Array.tabulate(rank)(k => b.u64(keyAt + 8 + k * 8))
          val start = checkedAt(child, csize.toLong, b.bytes.length, "chunk data")
          val raw = java.util.Arrays.copyOfRange(b.bytes, start, start + csize)
          g.scatter(offs, g.defilterChain(raw, mask))
        }
        i += 1
      }
    }
    visit(btree)
    out
  }

  /** Version-4 ("latest format") chunk-index read — the libhdf5
    * `libver='latest'` layouts: single-chunk, implicit, and fixed-array
    * indexes for FIXED-maxdim datasets (VERDICT r15 #5) plus the
    * extensible array for ONE unlimited maxdim (VERDICT r16 #4;
    * v2-B-tree — several unlimited maxdims — stays a named rejection).
    * The fixed array is the fixed-shape common case: a
    * lookup3-checksummed FAHD header pointing at one FADB data block
    * whose i-th element addresses grid cell i in row-major order
    * (client 0 = address only; client 1 = address + chunk size + filter
    * mask, the filtered-dataset form). The extensible array is what an
    * APPENDABLE time axis gets: the same element encodes, reached
    * through the EAHD header's index block — inline elements, then
    * geometrically growing data blocks addressed directly or via super
    * blocks ([[EaLayout]]). A fixed array past 2^pageBits entries
    * (libhdf5 default 1024) goes PAGED — bitmap in the FADB,
    * per-checksummed element pages after it — and is read; a paged
    * EXTENSIBLE-array data block (reached only past ~65k chunks at the
    * default creation parameters) rejects by name. */
  private def readChunked4(
      f: H5File, ds: H5Dataset, c4: Chunk4, n: Int): Array[Double] = {
    val out = Array.fill(n)(Double.NaN)
    if (c4.addr == Undef) return out
    val b = new Buf(f.bytes)
    val g = new ChunkGeom(ds, c4.dims, out)
    val nChunks = g.grid.product.max(1L)
    val chunkBytes = g.chunkElems.toLong * g.elem
    // grid-cell i → chunk offsets, row-major over the grid
    def gridOffs(i: Long): Array[Long] = {
      val offs = new Array[Long](g.rank)
      var rem = i
      var k = g.rank - 1
      while (k >= 0) {
        offs(k) = (rem % g.grid(k)) * g.chunkDims(k)
        rem /= g.grid(k)
        k -= 1
      }
      offs
    }
    def rawChunk(addr: Long, size: Long, what: String): Array[Byte] = {
      val start = checkedAt(addr, size, b.bytes.length, what)
      java.util.Arrays.copyOfRange(b.bytes, start, start + size.toInt)
    }
    c4.idxType match {
      case 1 => // single chunk: the address IS the chunk blob
        require(nChunks == 1,
          s"single-chunk index on a $nChunks-cell chunk grid")
        c4.singleFiltered match {
          case Some((size, mask)) =>
            require(size > 0 && size <= Int.MaxValue, s"single chunk size $size out of range")
            g.scatter(gridOffs(0),
              g.defilterChain(rawChunk(c4.addr, size, "single chunk"), mask))
          case None =>
            require(ds.filters.isEmpty,
              "filtered dataset with an unfiltered single-chunk index " +
                "(layout lacks the filtered-single-chunk flag)")
            g.scatter(gridOffs(0), rawChunk(c4.addr, chunkBytes, "single chunk"))
        }
      case 2 => // implicit: unfiltered chunks tight at addr, row-major
        var i = 0L
        while (i < nChunks) {
          g.scatter(gridOffs(i),
            rawChunk(c4.addr + i * chunkBytes, chunkBytes, "implicit chunk"))
          i += 1
        }
      case 3 => // fixed array: FAHD header → FADB data block → elements
        val hAt = checkedAt(c4.addr, 28, b.bytes.length, "fixed-array header")
        require(b.ascii(hAt, 4) == "FAHD", "bad fixed-array header signature")
        require(b.u8(hAt + 4) == 0,
          s"fixed-array version ${b.u8(hAt + 4)} unsupported")
        val client = b.u8(hAt + 5)
        require(client == 0 || client == 1,
          s"fixed-array client $client unsupported (subset reads dataset chunks)")
        require((client == 1) == ds.filters.nonEmpty,
          s"fixed-array client $client disagrees with the dataset's filter pipeline")
        val entrySize = b.u8(hAt + 6)
        val pageBits = b.u8(hAt + 7)
        val maxEnt = b.u64(hAt + 8)
        val dbAddr = b.u64(hAt + 16)
        checkLookup3(b, hAt, 24, "fixed-array header")
        require(maxEnt == nChunks,
          s"fixed array holds $maxEnt entries for a $nChunks-cell chunk grid")
        require(pageBits >= 1 && pageBits <= 62,
          s"fixed-array page bits $pageBits out of range")
        if (dbAddr == Undef) return out
        if (client == 0) require(entrySize == 8,
          s"fixed-array entry size $entrySize != 8 for unfiltered chunks")
        else require(entrySize >= 13 && entrySize <= 20,
          s"fixed-array entry size $entrySize outside 13-20 for filtered chunks")
        // PAGED data block (more entries than 2^pageBits — the >1024-
        // chunk shape of a large archive cube): the FADB carries only a
        // page-initialization bitmap, and the element pages follow it
        // contiguously, each with its own lookup3 checksum.
        val pageNelmts = 1L << pageBits
        val paged = maxEnt > pageNelmts
        val nPages = if (paged) (maxEnt + pageNelmts - 1) / pageNelmts else 0L
        val bitmapBytes = if (paged) (nPages + 7) / 8 else 0L
        val dbSize =
          if (paged) 14L + bitmapBytes + 4
          else 14L + maxEnt * entrySize + 4
        val dAt = checkedAt(dbAddr, dbSize, b.bytes.length, "fixed-array data block")
        require(b.ascii(dAt, 4) == "FADB", "bad fixed-array data block signature")
        require(b.u8(dAt + 4) == 0 && b.u8(dAt + 5) == client,
          "fixed-array data block version/client mismatch")
        require(b.u64(dAt + 6) == c4.addr,
          "fixed-array data block does not point back at its header")
        checkLookup3(b, dAt, (dbSize - 4).toInt, "fixed-array data block")
        def pageNel(p: Long): Long =
          if (p == nPages - 1) maxEnt - p * pageNelmts else pageNelmts
        val pagesAt = dAt + dbSize // pages are laid out right after the FADB
        val pageChecked = scala.collection.mutable.Set.empty[Long]
        // byte position of element i, or -1 while its page is uninitialized.
        // Bitmap bits are MSB-FIRST within each byte — libhdf5's H5VM bit
        // ops index bit k of a byte as `0x80 >> k` (H5VM_bit_get), not
        // `1 << k`; an LSB-first read would see the trailing pages of any
        // file whose page count is not a multiple of 8 as uninitialized
        // and silently emit fill values (ADVICE r17).
        def faElementAt(i: Long): Long =
          if (!paged) dAt + 14 + i * entrySize
          else {
            val p = i / pageNelmts
            if ((b.u8((dAt + 14 + p / 8).toInt) & (0x80 >> (p % 8).toInt)) == 0) -1L
            else {
              var pAt = pagesAt
              var q = 0L
              while (q < p) { pAt += pageNel(q) * entrySize + 4; q += 1 }
              if (pageChecked.add(p)) {
                val len = pageNel(p) * entrySize
                checkedAt(pAt, len + 4, b.bytes.length, "fixed-array data block page")
                checkLookup3(b, pAt.toInt, len.toInt, "fixed-array data block page")
              }
              pAt + (i % pageNelmts) * entrySize
            }
          }
        var i = 0L
        while (i < maxEnt) {
          val eAt0 = faElementAt(i)
          val eAt = eAt0.toInt
          val addr = if (eAt0 < 0) Undef else b.u64(eAt)
          if (addr != Undef) {
            if (client == 0)
              g.scatter(gridOffs(i), rawChunk(addr, chunkBytes, "fixed-array chunk"))
            else {
              val szLen = entrySize - 12 // address(8) + size(szLen) + mask(4)
              val size = b.uvar(eAt + 8, szLen)
              val mask = b.u32(eAt + 8 + szLen)
              require(size > 0 && size <= Int.MaxValue,
                s"fixed-array chunk size $size out of range")
              g.scatter(gridOffs(i),
                g.defilterChain(rawChunk(addr, size, "fixed-array chunk"), mask))
            }
          }
          i += 1
        }
      case 4 => // extensible array — the UNLIMITED-maxdim chunk index
        // (a growing forecast archive's time axis): EAHD header → EAIB
        // index block (inline elements + direct data-block addresses +
        // super-block addresses) → EASB super blocks → EADB data blocks.
        // Geometry per the public HDF5 format spec / H5EA algorithm:
        // element e (grid cell, row-major) past the inline prefix lands
        // in super block ⌊log2(e/minElmts + 1)⌋; see [[EaLayout]].
        val hAt = checkedAt(c4.addr, 72, b.bytes.length, "extensible-array header")
        require(b.ascii(hAt, 4) == "EAHD", "bad extensible-array header signature")
        require(b.u8(hAt + 4) == 0,
          s"extensible-array version ${b.u8(hAt + 4)} unsupported")
        val client = b.u8(hAt + 5)
        require(client == 0 || client == 1,
          s"extensible-array client $client unsupported (subset reads dataset chunks)")
        require((client == 1) == ds.filters.nonEmpty,
          s"extensible-array client $client disagrees with the dataset's filter pipeline")
        val elmtSize = b.u8(hAt + 6)
        if (client == 0) require(elmtSize == 8,
          s"extensible-array element size $elmtSize != 8 for unfiltered chunks")
        else require(elmtSize >= 13 && elmtSize <= 20,
          s"extensible-array element size $elmtSize outside 13-20 for filtered chunks")
        val maxBits = b.u8(hAt + 7)
        val idxBlkElmts = b.u8(hAt + 8)
        val minElmts = b.u8(hAt + 9)
        val minPtrs = b.u8(hAt + 10)
        val dblkPageBits = b.u8(hAt + 11)
        require(maxBits >= 1 && maxBits <= 64,
          s"extensible-array max-elements bits $maxBits out of range")
        require(dblkPageBits >= 1 && dblkPageBits <= 62,
          s"extensible-array data-block page bits $dblkPageBits out of range")
        require(minElmts >= 1 && (minElmts & (minElmts - 1)) == 0,
          s"extensible-array data-block min elements $minElmts not a power of two")
        require(minPtrs >= 2 && (minPtrs & (minPtrs - 1)) == 0,
          s"extensible-array super-block min pointers $minPtrs not a power of two")
        // six stats Lengths skipped (informational); index block address
        val ibAddr = b.u64(hAt + 60)
        checkLookup3(b, hAt, 68, "extensible-array header")
        if (ibAddr == Undef) return out
        val ea = new EaLayout(maxBits, idxBlkElmts, minElmts, minPtrs)
        val arrOffSize = (maxBits + 7) / 8
        val ibSize = 14L + idxBlkElmts.toLong * elmtSize +
          (ea.ndblkAddrs + ea.nsblkAddrs) * 8L + 4L
        val ibAt = checkedAt(ibAddr, ibSize, b.bytes.length,
          "extensible-array index block")
        require(b.ascii(ibAt, 4) == "EAIB", "bad extensible-array index block signature")
        require(b.u8(ibAt + 4) == 0 && b.u8(ibAt + 5) == client,
          "extensible-array index block version/client mismatch")
        require(b.u64(ibAt + 6) == c4.addr,
          "extensible-array index block does not point back at its header")
        checkLookup3(b, ibAt, (ibSize - 4).toInt, "extensible-array index block")
        val ibElemsAt = ibAt + 14
        val ibDblkAt = ibElemsAt + idxBlkElmts * elmtSize
        val ibSblkAt = ibDblkAt + ea.ndblkAddrs * 8
        // paging geometry (H5EA__sblock_alloc): a super block's data
        // blocks split into pages when their element count exceeds
        // 2^dblkPageBits; the SUPER BLOCK then carries one page-init
        // buffer of ndblks × ceil(npages/8) BYTES between its block
        // offset and its data-block addresses — but H5EA__lookup_elmt
        // indexes it as a CONTINUOUS bit stream (dblk_idx·npages +
        // page_idx, H5VM MSB-first within each byte): the buffer is
        // per-dblk byte-PADDED, the bit indexing is not, so trailing
        // pad bytes are simply never addressed.
        val pageNelmts = 1L << dblkPageBits
        def sbNpages(u: Int): Long = {
          val nel = ea.dblkNelmts(u)
          if (nel > pageNelmts) nel / pageNelmts else 0L
        }
        def sbBitmapBytes(u: Int): Long = {
          val np = sbNpages(u)
          if (np == 0) 0L else ea.ndblks(u) * ((np + 7) / 8)
        }
        // validated-block caches: each EASB/EADB is signature/pointer/
        // checksum-verified once however many chunks it serves
        val sblkAt = scala.collection.mutable.Map.empty[Int, Int]
        val dblkAt = scala.collection.mutable.Map.empty[Long, Int]
        val pagedDblkAt = scala.collection.mutable.Map.empty[Long, Int]
        val pageChecked = scala.collection.mutable.Set.empty[(Long, Long)]
        def superBlock(u: Int): Int = sblkAt.getOrElseUpdate(u, {
          val addr = b.u64(ibSblkAt + (u - ea.s0) * 8)
          if (addr == Undef) -1
          else {
            val size = 14L + arrOffSize + sbBitmapBytes(u) + ea.ndblks(u) * 8L + 4L
            val at = checkedAt(addr, size, b.bytes.length, "extensible-array super block")
            require(b.ascii(at, 4) == "EASB", "bad extensible-array super block signature")
            require(b.u8(at + 4) == 0 && b.u8(at + 5) == client,
              "extensible-array super block version/client mismatch")
            require(b.u64(at + 6) == c4.addr,
              "extensible-array super block does not point back at its header")
            checkLookup3(b, at, (size - 4).toInt, "extensible-array super block")
            at
          }
        })
        def dataBlock(addr: Long, nelmts: Long): Int = dblkAt.getOrElseUpdate(addr, {
          val size = 14L + arrOffSize + nelmts * elmtSize + 4L
          val at = checkedAt(addr, size, b.bytes.length, "extensible-array data block")
          require(b.ascii(at, 4) == "EADB", "bad extensible-array data block signature")
          require(b.u8(at + 4) == 0 && b.u8(at + 5) == client,
            "extensible-array data block version/client mismatch")
          require(b.u64(at + 6) == c4.addr,
            "extensible-array data block does not point back at its header")
          checkLookup3(b, at, (size - 4).toInt, "extensible-array data block")
          at
        })
        // a PAGED data block's on-disk body is only its prefix —
        // sig/version/client/header-pointer/block-offset plus the
        // prefix's own checksum (H5EA_DBLOCK_PREFIX_SIZE); the pages
        // (pageNelmts elements + a per-page checksum each) are laid out
        // contiguously right after it and verified individually on
        // first touch, exactly the paged fixed-array shape
        def dataBlockPaged(addr: Long): Int = pagedDblkAt.getOrElseUpdate(addr, {
          val prefix = 14L + arrOffSize + 4L
          val at = checkedAt(addr, prefix, b.bytes.length,
            "paged extensible-array data block")
          require(b.ascii(at, 4) == "EADB", "bad extensible-array data block signature")
          require(b.u8(at + 4) == 0 && b.u8(at + 5) == client,
            "extensible-array data block version/client mismatch")
          require(b.u64(at + 6) == c4.addr,
            "extensible-array data block does not point back at its header")
          checkLookup3(b, at, (prefix - 4).toInt, "paged extensible-array data block")
          at
        })
        // byte position of element i, or -1 while its block (or page)
        // is unallocated/uninitialized
        def elementAt(i: Long): Long = {
          if (i < idxBlkElmts) return ibElemsAt + i * elmtSize
          val e = i - idxBlkElmts
          val u = ea.sblkOf(e)
          require(u < ea.nsblks,
            s"extensible-array element $i beyond the declared 2^$maxBits capacity")
          val nelmts = ea.dblkNelmts(u)
          val rel = e - ea.startIdx(u)
          val dblkIdx = rel / nelmts
          val off = rel % nelmts
          val npages = sbNpages(u)
          if (npages > 0) {
            // the page-init bitmap lives in the owning SUPER block; a
            // paged data block hanging off the index block has nowhere
            // to record page state (libhdf5's default creation
            // parameters never produce one — paging starts at data
            // blocks far larger than the index-block tier's)
            require(u >= ea.s0,
              "paged extensible-array data block addressed from the index block unsupported")
            val sAt = superBlock(u)
            if (sAt < 0) return -1L
            val addr = b.u64((sAt.toLong + 14 + arrOffSize + sbBitmapBytes(u) +
              dblkIdx * 8).toInt)
            if (addr == Undef) return -1L
            val pageIdx = off / pageNelmts
            val bitIdx = dblkIdx * npages + pageIdx
            if ((b.u8((sAt.toLong + 14 + arrOffSize + bitIdx / 8).toInt) &
                (0x80 >> (bitIdx % 8).toInt)) == 0) return -1L
            val dAt = dataBlockPaged(addr)
            val pageSize = pageNelmts * elmtSize + 4
            val pAt = dAt + 14L + arrOffSize + 4L + pageIdx * pageSize
            if (pageChecked.add((addr, pageIdx))) {
              checkedAt(pAt, pageSize, b.bytes.length,
                "extensible-array data block page")
              checkLookup3(b, pAt.toInt, (pageNelmts * elmtSize).toInt,
                "extensible-array data block page")
            }
            return pAt + (off % pageNelmts) * elmtSize
          }
          val addr =
            if (u < ea.s0)
              b.u64((ibDblkAt.toLong + (ea.startDblk(u) + dblkIdx) * 8).toInt)
            else {
              val sAt = superBlock(u)
              if (sAt < 0) return -1L
              b.u64((sAt.toLong + 14 + arrOffSize + dblkIdx * 8).toInt)
            }
          if (addr == Undef) -1L
          else dataBlock(addr, nelmts) + 14L + arrOffSize + off * elmtSize
        }
        var i = 0L
        while (i < nChunks) {
          val eAt = elementAt(i).toInt
          if (eAt >= 0) {
            val addr = b.u64(eAt)
            if (addr != Undef) {
              if (client == 0)
                g.scatter(gridOffs(i),
                  rawChunk(addr, chunkBytes, "extensible-array chunk"))
              else {
                val szLen = elmtSize - 12 // address(8) + size(szLen) + mask(4)
                val size = b.uvar(eAt + 8, szLen)
                val mask = b.u32(eAt + 8 + szLen)
                require(size > 0 && size <= Int.MaxValue,
                  s"extensible-array chunk size $size out of range")
                g.scatter(gridOffs(i),
                  g.defilterChain(rawChunk(addr, size, "extensible-array chunk"), mask))
              }
            }
          }
          i += 1
        }
      case 5 => // version-2 B-tree — the several-unlimited-maxdims index
        // (e.g. appendable time AND ensemble axes). Reads the FULL tree:
        // BTHD header → BTIN internal nodes (records interleaved with
        // child pointers) → BTLF leaves; node geometry (max records per
        // depth, child-pointer field widths) is derived from the declared
        // node size exactly as H5B2hdr computes it, since the on-disk
        // child pointers encode their record counts at those widths.
        // Record types per the public spec: 10 = non-filtered (address +
        // scaled offsets), 11 = filtered (+ variable-width chunk size +
        // mask).
        val hAt = checkedAt(c4.addr, 38, b.bytes.length, "v2-B-tree header")
        require(b.ascii(hAt, 4) == "BTHD", "bad v2-B-tree header signature")
        require(b.u8(hAt + 4) == 0,
          s"v2-B-tree version ${b.u8(hAt + 4)} unsupported")
        val recType = b.u8(hAt + 5)
        require(recType == 10 || recType == 11,
          s"v2-B-tree record type $recType unsupported (subset reads dataset chunks)")
        require((recType == 11) == ds.filters.nonEmpty,
          s"v2-B-tree record type $recType disagrees with the dataset's filter pipeline")
        val nodeSize = b.u32(hAt + 6)
        val recSize = b.u16(hAt + 10)
        val depth = b.u16(hAt + 12)
        val rootAddr = b.u64(hAt + 16)
        val rootNrec = b.u16(hAt + 24)
        val totNrec = b.u64(hAt + 26)
        checkLookup3(b, hAt, 34, "v2-B-tree header")
        require(totNrec <= nChunks,
          s"v2-B-tree addresses $totNrec chunks for a $nChunks-cell grid")
        val rank = g.rank
        val szLen = recSize - (if (recType == 10) 8 + rank * 8 else 12 + rank * 8)
        if (recType == 10) require(szLen == 0,
          s"v2-B-tree record size $recSize != ${8 + rank * 8} for rank-$rank unfiltered chunks")
        else require(szLen >= 1 && szLen <= 8,
          s"v2-B-tree record size $recSize out of range for rank-$rank filtered chunks")
        def record(rAt: Int): Unit = {
          val addr = b.u64(rAt)
          val (size, mask, scaledAt) =
            if (recType == 10) (chunkBytes, 0L, rAt + 8)
            else {
              val s = b.uvar(rAt + 8, szLen)
              (s, b.u32(rAt + 8 + szLen), rAt + 12 + szLen)
            }
          val offs = new Array[Long](rank)
          var k = 0
          while (k < rank) {
            val scaled = b.u64(scaledAt + k * 8)
            require(scaled >= 0 && scaled < g.grid(k),
              s"v2-B-tree record scaled offset $scaled outside the dim-$k grid")
            offs(k) = scaled * g.chunkDims(k)
            k += 1
          }
          if (addr != Undef) {
            if (recType == 10)
              g.scatter(offs, rawChunk(addr, size, "v2-B-tree chunk"))
            else {
              require(size > 0 && size <= Int.MaxValue,
                s"v2-B-tree chunk size $size out of range")
              g.scatter(offs,
                g.defilterChain(rawChunk(addr, size, "v2-B-tree chunk"), mask))
            }
          }
        }
        walkBt2(b, recType, nodeSize, recSize, depth, rootAddr, rootNrec,
          totNrec, "v2-B-tree")(record)
    }
    out
  }

  /** Shared v2-B-tree traversal — the H5B2hdr node geometry derived
    * from the declared node size: a leaf holds (nodeSize − 10)/recSize
    * records (10 = sig+ver+type+checksum); an internal node at depth d
    * interleaves records with child pointers of width 8 (address) +
    * encSize(leaf max) (child record count — the header-level width,
    * sized off the LEAF max because it is the largest) +
    * encSize(cumulative max at d−1) when d > 1 (child-subtree total
    * record count). Walks BTIN internal nodes and BTLF leaves at any
    * depth, verifying signatures, types, checksums, per-node record
    * bounds, and that the visited total equals the header's count (so
    * an empty/undefined root with a nonzero declared total rejects
    * instead of silently yielding nothing). Used by BOTH the chunk
    * index ([[readChunked4]] case 5) and the dense-link name index
    * ([[readDenseLinks]]); `label` prefixes every rejection. */
  private def walkBt2(b: Buf, recType: Int, nodeSize: Long, recSize: Int,
      depth: Int, rootAddr: Long, rootNrec: Int, totNrec: Long,
      label: String)(onRecord: Int => Unit): Unit = {
    def encSize(v: Long): Int =
      (63 - java.lang.Long.numberOfLeadingZeros(math.max(1L, v))) / 8 + 1
    val leafMax = (nodeSize - 10) / recSize
    require(leafMax >= 1,
      s"$label node size $nodeSize cannot hold one $recSize-byte record")
    require(depth <= 16, s"$label depth $depth implausible")
    val maxNrecSize = encSize(leafMax)
    val maxN = new Array[Long](depth + 1)
    val cumSize = new Array[Int](depth + 1)
    maxN(0) = leafMax
    var cum = leafMax
    cumSize(0) = 0
    var d0 = 1
    while (d0 <= depth) {
      val ptr = 8 + maxNrecSize + (if (d0 > 1) cumSize(d0 - 1) else 0)
      maxN(d0) = (nodeSize - (10 + ptr)) / (recSize + ptr)
      require(maxN(d0) >= 1,
        s"$label node size $nodeSize cannot hold an internal record at depth $d0")
      cum = (maxN(d0) + 1) * cum + maxN(d0)
      cumSize(d0) = encSize(cum)
      d0 += 1
    }
    require(totNrec <= cum,
      s"$label total records $totNrec beyond the depth-$depth capacity $cum")
    var seen = 0L
    def walk(addr: Long, nrec: Int, d: Int): Unit = {
      require(nrec <= maxN(d),
        s"$label node holds $nrec records, beyond the depth-$d max ${maxN(d)}")
      seen += nrec
      if (d == 0) {
        val lfSize = 6L + nrec.toLong * recSize + 4
        val lAt = checkedAt(addr, lfSize, b.bytes.length, s"$label leaf")
        require(b.ascii(lAt, 4) == "BTLF", s"bad $label leaf signature")
        require(b.u8(lAt + 4) == 0 && b.u8(lAt + 5) == recType,
          s"$label leaf version/type mismatch")
        checkLookup3(b, lAt, (lfSize - 4).toInt, s"$label leaf")
        var r = 0
        while (r < nrec) { onRecord(lAt + 6 + r * recSize); r += 1 }
      } else {
        val ptrSz = 8 + maxNrecSize + (if (d > 1) cumSize(d - 1) else 0)
        val inSize = 6L + nrec.toLong * recSize + (nrec + 1).toLong * ptrSz + 4
        val iAt = checkedAt(addr, inSize, b.bytes.length, s"$label internal node")
        require(b.ascii(iAt, 4) == "BTIN", s"bad $label internal node signature")
        require(b.u8(iAt + 4) == 0 && b.u8(iAt + 5) == recType,
          s"$label internal node version/type mismatch")
        checkLookup3(b, iAt, (inSize - 4).toInt, s"$label internal node")
        var r = 0
        while (r < nrec) { onRecord(iAt + 6 + r * recSize); r += 1 }
        val ptrsAt = iAt + 6 + nrec * recSize
        var c = 0
        while (c <= nrec) {
          val pAt = ptrsAt + c * ptrSz
          val cAddr = b.u64(pAt)
          require(cAddr != Undef,
            s"$label internal node has an unallocated child pointer")
          walk(cAddr, b.uvar(pAt + 8, maxNrecSize).toInt, d - 1)
          c += 1
        }
      }
    }
    if (rootAddr != Undef && rootNrec > 0) walk(rootAddr, rootNrec, depth)
    require(seen == totNrec,
      s"$label visited $seen records, header declares $totNrec")
  }

  /** Extensible-array geometry (public HDF5 format spec / the H5EA
    * algorithm): past the `idxBlkElmts` elements stored inline in the
    * index block, elements live in data blocks grouped into super
    * blocks — super block `u` holds `2^(u/2)` data blocks of
    * `2^((u+1)/2) · minElmts` elements each (so capacity doubles per
    * super block), and the data blocks of the first `s0 = 2·log2(minPtrs)`
    * super blocks are addressed DIRECTLY from the index block
    * (`ndblkAddrs = 2·(minPtrs−1)` slots), later ones via their super
    * block's address array. */
  private final class EaLayout(maxBits: Int, val idxBlkElmts: Int,
      minElmts: Int, minPtrs: Int) {
    private def log2(x: Int): Int = 63 - java.lang.Long.numberOfLeadingZeros(x.toLong).toInt
    val s0: Int = 2 * log2(minPtrs)
    val nsblks: Int = 1 + (maxBits - log2(minElmts))
    val ndblkAddrs: Int = 2 * (minPtrs - 1)
    val nsblkAddrs: Int = math.max(0, nsblks - s0)
    def ndblks(u: Int): Long = 1L << (u / 2)
    def dblkNelmts(u: Int): Long = (1L << ((u + 1) / 2)) * minElmts
    /** First post-inline element index served by super block u. */
    def startIdx(u: Int): Long = ((1L << u) - 1L) * minElmts
    /** Data blocks in super blocks before u (the index block's direct
      * address slots are laid out in this order). */
    def startDblk(u: Int): Long = {
      var s = 0L; var v = 0
      while (v < u) { s += ndblks(v); v += 1 }
      s
    }
    /** Super block serving post-inline element e: ⌊log2(e/minElmts + 1)⌋. */
    def sblkOf(e: Long): Int =
      63 - java.lang.Long.numberOfLeadingZeros(e / minElmts + 1).toInt
  }

  /** HDF5's fletcher-32 checksum (public H5checksum algorithm): fold the
    * data as big-endian 16-bit words into two 16-bit running sums (360
    * words per overflow-fold block), odd tail byte high-aligned; result
    * is (sum2 << 16) | sum1. */
  private[sources] def fletcher32(data: Array[Byte], len: Int): Long = {
    var sum1 = 0L
    var sum2 = 0L
    var i = 0
    var words = len / 2
    while (words > 0) {
      var tlen = math.min(360, words)
      words -= tlen
      while (tlen > 0) {
        sum1 += (((data(i) & 0xffL) << 8) | (data(i + 1) & 0xffL))
        i += 2
        sum2 += sum1
        tlen -= 1
      }
      sum1 = (sum1 & 0xffff) + (sum1 >> 16)
      sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    }
    if (len % 2 == 1) {
      sum1 += (data(len - 1) & 0xffL) << 8
      sum2 += sum1
      sum1 = (sum1 & 0xffff) + (sum1 >> 16)
      sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    }
    // second fold guarantees each sum fits 16 bits
    sum1 = (sum1 & 0xffff) + (sum1 >> 16)
    sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    ((sum2 << 16) | sum1) & 0xffffffffL
  }

  /** Undo one filter on a chunk's bytes (read side). `maxOut` bounds the
    * decompressed size — the caller knows the chunk's true byte count, so
    * a hostile deflate stream rejects by name the moment it overruns
    * instead of ballooning to deflate's ~1000:1 worst case and OOMing
    * before scatter's size check (review finding — the same failure
    * class the dataspace edge-decode budget guards). */
  private def defilter(f: H5Filter, data: Array[Byte], elem: Int,
                       maxOut: Int): Array[Byte] = f.id match {
    case 1 => // deflate (zlib stream)
      val inf = new java.util.zip.Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.min(maxOut, math.max(64, data.length * 4)))
      val buf = new Array[Byte](8192)
      try {
        while (!inf.finished()) {
          val k = inf.inflate(buf)
          require(k > 0 || inf.finished(), "truncated/corrupt deflate chunk")
          require(out.size() + k <= maxOut,
            s"deflate chunk inflates past the expected $maxOut bytes")
          out.write(buf, 0, k)
        }
      } finally inf.end()
      out.toByteArray
    case 2 => // shuffle: bytes stored plane-by-plane; de-interleave.
      // A non-multiple tail (e.g. a fletcher32 checksum appended BEFORE
      // shuffle in the pipeline) is passed through unshuffled, exactly
      // as HDF5's shuffle filter leaves leftover bytes in place.
      val nEl = data.length / elem
      val out = new Array[Byte](data.length)
      var j = 0
      while (j < elem) {
        var i = 0
        while (i < nEl) { out(i * elem + j) = data(j * nEl + i); i += 1 }
        j += 1
      }
      var t = nEl * elem
      while (t < data.length) { out(t) = data(t); t += 1 }
      out
    case 3 => // fletcher32: verify the appended checksum and strip it
      require(data.length >= 4, "fletcher32 chunk shorter than its checksum")
      val n = data.length - 4
      val stored = ByteBuffer.wrap(data, n, 4).order(ByteOrder.LITTLE_ENDIAN)
        .getInt & 0xffffffffL
      val computed = fletcher32(data, n)
      // accept the byte-swapped form too — HDF5's reader does, for data
      // written by pre-1.6.3 libraries that stored it big-endian
      val swapped = java.lang.Integer.reverseBytes(stored.toInt) & 0xffffffffL
      require(computed == stored || computed == swapped,
        f"fletcher32 checksum mismatch (stored 0x$stored%08x, computed 0x$computed%08x)")
      java.util.Arrays.copyOfRange(data, 0, n)
    case id => throw new IllegalArgumentException(s"filter $id${filterName(id)} unsupported")
  }

  // parsed data-layout message variants
  private sealed trait Layout
  private case class LayoutCompact(inline: Array[Byte]) extends Layout
  private case class LayoutContiguous(addr: Long, size: Long) extends Layout
  private case class LayoutChunked(btree: Long, dims: Seq[Int]) extends Layout
  private case class LayoutChunked4(c4: Chunk4) extends Layout

  // message-walk result for one object header; dataspace = (dims, maxDims);
  // groupish = a link-info/group-info message was present (marks a
  // new-style GROUP even when it holds no links at all); dense = the
  // link-info message points at a fractal heap — DENSE link storage,
  // (fractal heap address, name-index v2 B-tree address)
  private case class Header(
      dataspace: Option[(Seq[Long], Seq[Long])],
      datatype: Option[Either[Int, NumType]],
      layout: Option[Layout],
      attrs: Seq[H5Attr],
      stab: Option[(Long, Long)],
      filters: Seq[H5Filter],
      links: Seq[(String, Long)] = Nil,
      groupish: Boolean = false,
      dense: Option[(Long, Long)] = None,
      denseAttrs: Option[(Long, Long)] = None)

  private def readHeader(b: Buf, addr: Long): Header = {
    val base = checkedAt(addr, 16, b.bytes.length, "object header")
    // v2 headers announce themselves with the OHDR signature; a v1
    // header's first byte is its version (1)
    if (b.ascii(base, 4) == "OHDR") readHeaderV2(b, base)
    else readHeaderV1(b, base)
  }

  private def readHeaderV1(b: Buf, base: Int): Header = {
    val ver = b.u8(base)
    require(ver == 1,
      s"object header version $ver unsupported (subset reads v1 and v2/OHDR)")
    val nMsgs = b.u16(base + 2)
    var dataspace: Option[(Seq[Long], Seq[Long])] = None
    var datatype: Option[Either[Int, NumType]] = None
    var layout: Option[Layout] = None
    var stab: Option[(Long, Long)] = None
    var filters: Seq[H5Filter] = Nil
    var groupish = false
    var dense: Option[(Long, Long)] = None
    var denseAttrs: Option[(Long, Long)] = None
    val attrs = Seq.newBuilder[H5Attr]
    val links = Seq.newBuilder[(String, Long)]
    var p = base + 16 // 12-byte v1 prefix + 4 alignment pad
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
        case 0x0002 => groupish = true; dense = parseLinkInfo(b, body).orElse(dense)
        case 0x0003 => datatype = Some(parseDatatype(b, body))
        case 0x0006 => links += parseLinkMsg(b, body)
        case 0x0008 => layout = Some(parseLayout(b, body))
        case 0x000A => groupish = true // group info
        case 0x000B => filters = parseFilters(b, body)
        case 0x000C => parseAttr(b, body).foreach(attrs += _)
        case 0x0010 => // continuation block
          next = checkedAt(b.u64(body), 8, b.bytes.length, "header continuation")
        case 0x0011 => stab = Some((b.u64(body), b.u64(body + 8)))
        case 0x0015 => denseAttrs = parseAttrInfo(b, body).orElse(denseAttrs)
        case _ => () // NIL, fill value, mtime, _NCProperties carriers, …
      }
      p = next
      seen += 1
    }
    Header(dataspace, datatype, layout, attrs.result(), stab, filters,
      links.result(), groupish, dense, denseAttrs)
  }

  /** Version-2 ("latest format") object header: OHDR prefix, 1-byte
    * message types, lookup3-checksummed chunks, OCHK continuation
    * blocks, and link messages in place of symbol tables. The message
    * SET is the same as v1's — only the framing differs — so everything
    * downstream (dataspace, datatype, layout, filters, attributes) is
    * shared with [[readHeaderV1]]. */
  private def readHeaderV2(b: Buf, base: Int): Header = {
    val ver = b.u8(base + 4)
    require(ver == 2, s"object header (OHDR) version $ver unsupported")
    val flags = b.u8(base + 5)
    var p = base + 6
    if ((flags & 0x20) != 0) p += 16 // access/mod/change/birth times
    if ((flags & 0x10) != 0) p += 4  // attribute-storage phase change
    val szBytes = 1 << (flags & 0x3)
    val chunk0 = (szBytes match {
      case 1 => b.u8(p).toLong
      case 2 => b.u16(p).toLong
      case 4 => b.u32(p)
      case _ => b.u64(p)
    })
    p += szBytes
    val msgStart = checkedAt(p.toLong, chunk0 + 4, b.bytes.length, "object header chunk 0")
    checkLookup3(b, base, msgStart + chunk0.toInt - base, "object header")
    // creation-order bytes ride between the message prefix and body when
    // the header tracks attribute creation order (flag bit 2)
    val orderBytes = if ((flags & 0x4) != 0) 2 else 0
    var dataspace: Option[(Seq[Long], Seq[Long])] = None
    var datatype: Option[Either[Int, NumType]] = None
    var layout: Option[Layout] = None
    var filters: Seq[H5Filter] = Nil
    var groupish = false
    var dense: Option[(Long, Long)] = None
    var denseAttrs: Option[(Long, Long)] = None
    val attrs = Seq.newBuilder[H5Attr]
    val links = Seq.newBuilder[(String, Long)]
    // chunk 0 + any continuation (OCHK) regions, walked in order
    var regions = List((msgStart, msgStart + chunk0.toInt))
    var guard = 0
    while (regions.nonEmpty) {
      guard += 1
      require(guard <= 64, "object header continuation chain too long")
      val (start, end) = regions.head
      regions = regions.tail
      var q = start
      // a trailing gap smaller than a message prefix is legal padding
      while (end - q >= 4 + orderBytes) {
        val typ = b.u8(q)
        val sz = b.u16(q + 1)
        val body = q + 4 + orderBytes
        require(body + sz <= end, s"v2 message body at $body+$sz beyond chunk end $end")
        typ match {
          case 0x01 => dataspace = Some(parseDataspace(b, body))
          case 0x02 => groupish = true; dense = parseLinkInfo(b, body).orElse(dense)
          case 0x03 => datatype = Some(parseDatatype(b, body))
          case 0x06 => links += parseLinkMsg(b, body)
          case 0x08 => layout = Some(parseLayout(b, body))
          case 0x0A => groupish = true // group info
          case 0x0B => filters = parseFilters(b, body)
          case 0x0C => parseAttr(b, body).foreach(attrs += _)
          case 0x15 => denseAttrs = parseAttrInfo(b, body).orElse(denseAttrs)
          case 0x10 =>
            val cAddr = b.u64(body)
            val cLen = b.u64(body + 8)
            require(cLen >= 8, s"continuation block length $cLen too short")
            val cAt = checkedAt(cAddr, cLen, b.bytes.length, "header continuation")
            require(b.ascii(cAt, 4) == "OCHK",
              "header continuation block missing OCHK signature")
            checkLookup3(b, cAt, cLen.toInt - 4, "header continuation")
            regions = regions :+ (cAt + 4, cAt + cLen.toInt - 4)
          case _ => () // NIL, fill value, mtime, …
        }
        q = body + sz
      }
    }
    Header(dataspace, datatype, layout, attrs.result(), None, filters,
      links.result(), groupish, dense, denseAttrs)
  }

  /** Link Info message (0x0002): the new-style group's link-storage
    * descriptor — it marks the object as a GROUP even when it holds no
    * link messages, and when the fractal heap address is allocated it
    * carries the DENSE storage pointers: (fractal heap address,
    * name-index v2 B-tree address), the layout libhdf5 switches to when
    * a latest-format group passes max_compact (default 8) links. */
  private def parseLinkInfo(b: Buf, p0: Int): Option[(Long, Long)] = {
    val ver = b.u8(p0)
    require(ver == 0, s"link info version $ver unsupported")
    val fl = b.u8(p0 + 1)
    val fheapAt = p0 + 2 + (if ((fl & 1) != 0) 8 else 0)
    val fheap = b.u64(fheapAt)
    if (fheap == Undef) None else Some((fheap, b.u64(fheapAt + 8)))
  }

  /** Attribute Info message (0x0015): dense attribute storage pointers
    * — (fractal heap address, name-index v2 B-tree address) when the
    * heap is allocated (attributes moved dense past max_compact), None
    * while attributes are still compact 0x000C messages. netCDF-4
    * tracks attribute creation order by default, so the message is
    * routinely present with undefined pointers; the max-creation-index
    * field, when tracked, is 2 bytes (unlike link info's 8). */
  private def parseAttrInfo(b: Buf, p0: Int): Option[(Long, Long)] = {
    val ver = b.u8(p0)
    require(ver == 0, s"attribute info version $ver unsupported")
    val fl = b.u8(p0 + 1)
    val fheapAt = p0 + 2 + (if ((fl & 1) != 0) 2 else 0)
    val fheap = b.u64(fheapAt)
    if (fheap == Undef) None else Some((fheap, b.u64(fheapAt + 8)))
  }

  /** Link message (0x0006), version 1 — the "latest format" group entry.
    * Subset reads HARD links with ASCII names; soft/external links are
    * rejected by name. */
  private def parseLinkMsg(b: Buf, p0: Int): (String, Long) = {
    var p = p0
    val ver = b.u8(p)
    require(ver == 1, s"link message version $ver unsupported")
    val fl = b.u8(p + 1)
    p += 2
    val ltype = if ((fl & 0x8) != 0) { val t = b.u8(p); p += 1; t } else 0
    require(ltype == 0,
      s"link type $ltype unsupported (subset reads hard links)")
    if ((fl & 0x4) != 0) p += 8  // creation order
    if ((fl & 0x10) != 0) p += 1 // name character set
    val lenSz = 1 << (fl & 0x3)
    val nameLen = (lenSz match {
      case 1 => b.u8(p).toLong
      case 2 => b.u16(p).toLong
      case 4 => b.u32(p)
      case _ => b.u64(p)
    })
    p += lenSz
    // name + the 8-byte hard-link address in ONE bound, so a file
    // truncated inside the link message rejects with this named reason
    // rather than an IndexOutOfBoundsException from the address read
    val nameAt = checkedAt(p.toLong, nameLen + 8, b.bytes.length, "link name")
    require(nameLen <= 4096, s"link name length $nameLen unreasonable")
    val name = new String(b.bytes, nameAt, nameLen.toInt, US_ASCII)
    (name, b.u64(nameAt + nameLen.toInt))
  }

  /** (dims, maxDims). When the max-dims flag is unset, maxDims == dims
    * (fixed shape). An UNLIMITED max dim is the spec's all-ones value
    * ([[Undef]]) — consumers need it to detect the extensible-array
    * swizzle case (H5Dearray orders chunks unlimited-dim-first when the
    * unlimited dimension is not dim 0). */
  private def parseDataspace(b: Buf, p: Int): (Seq[Long], Seq[Long]) = {
    val ver = b.u8(p)
    val rank = b.u8(p + 1)
    val flags = b.u8(p + 2)
    val dimsAt = ver match {
      case 1 => p + 8
      case 2 => p + 4
      case v => throw new IllegalArgumentException(s"dataspace version $v unsupported")
    }
    val dims = Seq.tabulate(rank)(i => b.u64(dimsAt + i * 8))
    val maxDims =
      if ((flags & 0x1) != 0)
        Seq.tabulate(rank)(i => b.u64(dimsAt + (rank + i) * 8))
      else dims
    (dims, maxDims)
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

  private def parseLayout(b: Buf, p: Int): Layout = {
    val ver = b.u8(p)
    require(ver == 3 || ver == 4,
      s"data layout version $ver unsupported (subset reads v3/v4)")
    b.u8(p + 1) match {
      case 0 => // compact: size u16, raw data inline (same v3/v4 encoding)
        val n = b.u16(p + 2)
        LayoutCompact(b.bytes.slice(p + 4, p + 4 + n))
      case 1 => LayoutContiguous(b.u64(p + 2), b.u64(p + 10))
      case 2 if ver == 3 => // chunked: dimensionality (rank+1), btree addr,
        // u32 dims (the trailing dim is the element size, per the spec)
        val dim = b.u8(p + 2)
        require(dim >= 2 && dim <= 33, s"chunk dimensionality $dim out of range")
        LayoutChunked(b.u64(p + 3),
          Seq.tabulate(dim) { i =>
            val v = b.u32(p + 11 + i * 4)
            require(v <= Int.MaxValue, s"chunk dimension $v exceeds Int range")
            v.toInt
          })
      case 2 => // v4 chunked — the "latest format" chunk indexes: flags,
        // rank+1 dims at a declared per-dim encoding width, index type +
        // type-specific info, then the index address
        val flags = b.u8(p + 2)
        val dim = b.u8(p + 3)
        require(dim >= 2 && dim <= 33, s"chunk dimensionality $dim out of range")
        val encLen = b.u8(p + 4)
        require(encLen >= 1 && encLen <= 8,
          s"chunk dimension encoding width $encLen out of range")
        val dims = Seq.tabulate(dim) { i =>
          val v = b.uvar(p + 5 + i * encLen, encLen)
          require(v >= 0 && v <= Int.MaxValue, s"chunk dimension $v exceeds Int range")
          v.toInt
        }
        var q = p + 5 + dim * encLen
        val idxType = b.u8(q)
        q += 1
        idxType match {
          case 1 => // single chunk; filtered variant carries (size, mask)
            val sf = if ((flags & 0x2) != 0) {
              val s = (b.u64(q), b.u32(q + 8)); q += 12; Some(s)
            } else None
            LayoutChunked4(Chunk4(1, b.u64(q), dims, singleFiltered = sf))
          case 2 => LayoutChunked4(Chunk4(2, b.u64(q), dims))
          case 3 =>
            val pageBits = b.u8(q)
            LayoutChunked4(Chunk4(3, b.u64(q + 1), dims, pageBits = pageBits))
          case 4 => // extensible array: 5 creation-param bytes (max bits,
            // index elements, min pointers, min elements, page bits) —
            // the authoritative copies live in the EAHD header, which is
            // where the reader takes them from — then the header address
            LayoutChunked4(Chunk4(4, b.u64(q + 5), dims))
          case 5 => // v2 B-tree (several unlimited maxdims): node size
            // (4), split/merge percents (1+1) — sizing hints the reader
            // doesn't need — then the BTHD header address
            LayoutChunked4(Chunk4(5, b.u64(q + 6), dims))
          case t => throw new IllegalArgumentException(s"chunk index type $t unknown")
        }
      case c => throw new IllegalArgumentException(s"data layout class $c unsupported")
    }
  }

  /** Filter pipeline message (0x000B), versions 1 and 2. v1 pads names to
    * 8 bytes and client data to an even count; v2 omits the name entirely
    * for ids < 256 and drops both paddings. */
  private def parseFilters(b: Buf, p: Int): Seq[H5Filter] = {
    val ver = b.u8(p)
    require(ver == 1 || ver == 2, s"filter pipeline version $ver unsupported")
    val n = b.u8(p + 1)
    require(n <= 32, s"filter pipeline of $n filters out of range")
    var at = if (ver == 1) p + 8 else p + 2
    Seq.fill(n) {
      val id = b.u16(at)
      val hasName = ver == 1 || id >= 256
      val nameLen = if (hasName) b.u16(at + 2) else 0
      val base = if (hasName) at + 4 else at + 2
      val nCd = b.u16(base + 2)
      val namePad = if (ver == 1) (nameLen + 7) / 8 * 8 else nameLen
      val cdAt = base + 4 + namePad
      val cdata = Seq.tabulate(nCd) { i =>
        val v = b.u32(cdAt + i * 4)
        require(v <= Int.MaxValue, s"filter client datum $v exceeds Int range")
        v.toInt
      }
      val cdPad = if (ver == 1 && nCd % 2 == 1) 4 else 0
      at = cdAt + nCd * 4 + cdPad
      H5Filter(id, cdata)
    }
  }

  /** v1/v2/v3 attribute messages. Vlen-of-object-reference attrs —
    * netCDF-4's `DIMENSION_LIST` — are PARSED (the references land in
    * [[H5Attr.refs]] and drive axis mapping); `REFERENCE_LIST` and
    * region-reference vlens keep their named skip (returns None —
    * skipped, not fatal; xarray also ignores them for decode), as do
    * attr datatypes outside the subset. */
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
    val count = parseDataspace(b, dsAt)._1.product.max(1L).toInt
    val cls = b.u8(dtAt) & 0x0f
    if (cls == 3) { // string: value bytes are the declared datatype size
      val len = b.u32(dtAt + 4).toInt
      Some(H5Attr(name, b.ascii(at, len).takeWhile(_ != '\u0000'), Nil))
    } else if (cls == 9 && (b.u8(dtAt + 1) & 0x0f) == 0 &&
        (b.u8(dtAt + 8) & 0x0f) == 7 && (b.u8(dtAt + 9) & 0x0f) == 0) {
      // vlen SEQUENCE of OBJECT references — netCDF-4's `DIMENSION_LIST`
      // (one vlen of dimension-scale references per axis). Each in-file
      // element is a 16-byte (length, global-heap collection address,
      // object index) descriptor; the reference addresses themselves
      // live in the global heap (spec §III.E). REFERENCE_LIST (vlen of
      // COMPOUND base) fails the base-class check and keeps its named
      // skip, as does vlen-of-region-reference (base bit-field type 1).
      val refs = Seq.tabulate(count) { i =>
        val q = at + i * 16
        val n = b.u32(q)
        require(n <= 64, s"DIMENSION_LIST vlen length $n out of range")
        val gaddr = b.u64(q + 4)
        if (n == 0) Seq.empty[Long]
        else {
          val dAt = globalHeapObject(b, gaddr, b.u32(q + 12).toInt, n * 8)
          Seq.tabulate(n.toInt)(j => b.u64(dAt + j * 8))
        }
      }
      Some(H5Attr(name, "", Nil, refs))
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
    val heapBase = checkedAt(heapAddr, 32, b.bytes.length, "local heap")
    require(b.ascii(heapBase, 4) == "HEAP", "bad local heap signature")
    val heapData = b.u64(heapBase + 24)

    def walk(atAddr: Long): Seq[(String, Long)] = {
      val at = checkedAt(atAddr, 24, b.bytes.length, "btree node")
      b.ascii(at, 4) match {
        case "TREE" =>
          // keys/children alternate after the 24-byte node header; level-0
          // children are SNODs, higher levels are btrees — walk dispatches
          // on the signature either way
          val n = b.u16(at + 6)
          Seq.tabulate(n)(i => b.u64(at + 24 + 8 + i * 16)).flatMap(walk)
        case "SNOD" =>
          val n = b.u16(at + 6)
          Seq.tabulate(n) { i =>
            val e = at + 8 + i * 40
            (b.cstr(checkedAt(heapData + b.u64(e), 1, b.bytes.length, "heap name")),
              b.u64(e + 8))
          }
        case sig => throw new IllegalArgumentException(s"bad group node signature '$sig'")
      }
    }
    walk(btreeAddr)
  }

  /** FRACTAL HEAP reader (FRHP header; FHDB direct blocks, optionally
    * under one FHIB root indirect block) — the managed-object store
    * behind BOTH dense link storage ([[readDenseLinks]]) and dense
    * attribute storage ([[readDenseAttrs]]). The subset reads
    * UNFILTERED heaps with managed objects in DIRECT blocks: huge/tiny
    * objects, filtered heaps, and indirect child rows reject by name
    * (a link or attribute message is tens of bytes — far below the
    * huge threshold — and the default doubling table's direct rows
    * cover ~526 KB ≈ 10⁴ objects). Every structure is signature- and
    * checksum-verified like the chunk indexes; FHDB checksums cover
    * the whole block with the checksum field zeroed (H5HF's rule,
    * unlike the trailing-field convention everywhere else). */
  private final class FHeap(b: Buf, fheapAddr: Long) {
    // --- fractal heap header (FRHP), public spec layout ---
    private val hAt = checkedAt(fheapAddr, 146, b.bytes.length, "fractal heap header")
    require(b.ascii(hAt, 4) == "FRHP", "bad fractal heap header signature")
    require(b.u8(hAt + 4) == 0,
      s"fractal heap version ${b.u8(hAt + 4)} unsupported")
    val heapIdLen: Int = b.u16(hAt + 5)
    require(b.u16(hAt + 7) == 0, "filtered fractal heap unsupported")
    private val flags = b.u8(hAt + 9)
    private val allocated = b.u64(hAt + 54)
    val nManaged: Long = b.u64(hAt + 70)
    require(b.u64(hAt + 86) == 0 && b.u64(hAt + 102) == 0,
      "fractal heap huge/tiny objects unsupported (subset reads managed objects)")
    val width = b.u16(hAt + 110)
    val startBlk = b.u64(hAt + 112)
    val maxDirect = b.u64(hAt + 120)
    val maxHeapBits = b.u16(hAt + 128)
    val rootAddr = b.u64(hAt + 132)
    val curRows = b.u16(hAt + 140)
    checkLookup3(b, hAt, 142, "fractal heap header")
    require(width >= 1 && width <= 1024, s"fractal heap table width $width out of range")
    require(startBlk >= 1 && (startBlk & (startBlk - 1)) == 0 &&
      maxDirect >= startBlk && (maxDirect & (maxDirect - 1)) == 0 &&
      maxDirect <= (1L << 40),
      s"fractal heap block sizes $startBlk/$maxDirect out of subset range")
    require(maxHeapBits >= 1 && maxHeapBits <= 64,
      s"fractal heap max-size bits $maxHeapBits out of range")
    val offSize: Int = (maxHeapBits + 7) / 8
    val lenSize: Int = heapIdLen - 1 - offSize
    require(lenSize >= 1 && lenSize <= 8,
      s"fractal heap id length $heapIdLen inconsistent with $maxHeapBits-bit offsets")
    val chksumDblocks = (flags & 0x2) != 0
    val dbHdrSize = 13 + offSize + (if (chksumDblocks) 4 else 0)
    // doubling table: rows 0 and 1 are startBlk-sized, row r≥2 doubles
    def rowSize(r: Int): Long = if (r < 2) startBlk else startBlk << (r - 1)
    val maxDirectRows =
      (63 - java.lang.Long.numberOfLeadingZeros(maxDirect / startBlk)).toInt + 2
    // root block map: curRows == 0 → the root IS one direct block whose
    // size is the heap's entire allocated managed space; otherwise an
    // FHIB indirect root whose first maxDirectRows rows point at direct
    // blocks (indirect children are beyond the subset)
    require(curRows <= maxDirectRows,
      s"fractal heap root with $curRows rows has indirect child rows, unsupported")
    val ibAt: Int =
      if (curRows == 0) -1
      else {
        val ibSize = 13L + offSize + curRows.toLong * width * 8 + 4
        val at = checkedAt(rootAddr, ibSize, b.bytes.length, "fractal heap indirect block")
        require(b.ascii(at, 4) == "FHIB", "bad fractal heap indirect block signature")
        require(b.u8(at + 4) == 0 && b.u64(at + 5) == fheapAddr,
          "fractal heap indirect block version/owner mismatch")
        require(b.uvar(at + 13, offSize) == 0L,
          "fractal heap root indirect block offset nonzero")
        checkLookup3(b, at, (ibSize - 4).toInt, "fractal heap indirect block")
        at
      }
    // validated direct blocks, keyed by (row, col); -1 rows = root direct
    val dblkAt = scala.collection.mutable.Map.empty[(Int, Int), Int]
    def directBlock(row: Int, col: Int, blockOff: Long, size: Long): Int =
      dblkAt.getOrElseUpdate((row, col), {
        val addr =
          if (curRows == 0) rootAddr
          else {
            val a = b.u64(ibAt + 13 + offSize + (row * width + col) * 8)
            require(a != Undef,
              "fractal heap object in an unallocated direct block")
            a
          }
        val at = checkedAt(addr, size, b.bytes.length, "fractal heap direct block")
        require(b.ascii(at, 4) == "FHDB", "bad fractal heap direct block signature")
        require(b.u8(at + 4) == 0 && b.u64(at + 5) == fheapAddr,
          "fractal heap direct block version/owner mismatch")
        require(b.uvar(at + 13, offSize) == blockOff,
          "fractal heap direct block offset mismatch")
        if (chksumDblocks) {
          val copy = java.util.Arrays.copyOfRange(b.bytes, at, at + size.toInt)
          val stored = b.u32(at + 13 + offSize)
          copy(13 + offSize) = 0; copy(14 + offSize) = 0
          copy(15 + offSize) = 0; copy(16 + offSize) = 0
          require((lookup3(copy, 0, size.toInt) & 0xffffffffL) == stored,
            "fractal heap direct block checksum mismatch")
        }
        at
      })
    // managed object at heap offset `off`, `len` bytes → absolute position
    def objectAt(off: Long, len: Long): Int = {
      require(len >= 1 && len <= Int.MaxValue, s"fractal heap object length $len out of range")
      if (curRows == 0) {
        // subtraction form: a hostile offset near Long.MAX cannot wrap
        require(off >= dbHdrSize && len <= allocated && off <= allocated - len,
          s"fractal heap object at $off (+$len) outside the root direct block")
        directBlock(-1, 0, 0L, allocated) + off.toInt
      } else {
        var row = 0
        var rowStart = 0L
        while (row < curRows && off >= rowStart + width * rowSize(row)) {
          rowStart += width * rowSize(row); row += 1
        }
        require(row < curRows, s"fractal heap object at $off beyond the root's $curRows rows")
        val col = ((off - rowStart) / rowSize(row)).toInt
        val blockOff = rowStart + col * rowSize(row)
        val within = off - blockOff
        require(within >= dbHdrSize && within + len <= rowSize(row),
          s"fractal heap object at $off (+$len) crosses its direct block")
        directBlock(row, col, blockOff, rowSize(row)) + within.toInt
      }
    }

    /** Resolve a managed heap ID at `idAt` — flag byte (version 0,
      * type 0 = managed), offset, length — to the object's absolute
      * byte position. */
    def managedObjectAt(idAt: Int): Int = {
      val fl = b.u8(idAt)
      require((fl & 0xf0) == 0,
        s"fractal heap id flags 0x${fl.toHexString} unsupported (subset reads managed objects)")
      objectAt(b.uvar(idAt + 1, offSize), b.uvar(idAt + 1 + offSize, lenSize))
    }

    /** Parse the heap-enumeration v2 B-tree header at `btreeAddr`
      * (record type must be `expectType`), then walk every record. */
    def walkIndex(btreeAddr: Long, expectType: Int, expectRecSize: Int,
                  label: String)(onRecord: Int => Unit): Unit = {
      val tAt = checkedAt(btreeAddr, 38, b.bytes.length, s"$label v2-B-tree header")
      require(b.ascii(tAt, 4) == "BTHD", s"bad $label v2-B-tree header signature")
      require(b.u8(tAt + 4) == 0, s"$label v2-B-tree version unsupported")
      val recType = b.u8(tAt + 5)
      require(recType == expectType,
        s"v2-B-tree record type $recType unsupported for a $label")
      val nodeSize = b.u32(tAt + 6)
      val recSize = b.u16(tAt + 10)
      val depth = b.u16(tAt + 12)
      val rootNode = b.u64(tAt + 16)
      val rootNrec = b.u16(tAt + 24)
      val totNrec = b.u64(tAt + 26)
      checkLookup3(b, tAt, 34, s"$label v2-B-tree header")
      require(recSize == expectRecSize,
        s"$label record size $recSize != expected $expectRecSize")
      require(totNrec == nManaged,
        s"$label holds $totNrec records but the heap declares $nManaged objects")
      walkBt2(b, recType, nodeSize, recSize, depth, rootNode, rootNrec,
        totNrec, label)(onRecord)
    }
  }

  /** DENSE link storage (r18): the layout libhdf5 switches a
    * latest-format group to past max_compact (default 8) links — each
    * link message becomes a managed object in a fractal heap
    * ([[FHeap]]), enumerated through the name-index v2 B-tree (record
    * type 5: 4-byte lookup3 name hash + managed heap ID). This is the
    * many-variable `libver='latest'` file shape. */
  private def readDenseLinks(b: Buf, fheapAddr: Long, btreeAddr: Long): Seq[(String, Long)] = {
    val heap = new FHeap(b, fheapAddr)
    val out = Seq.newBuilder[(String, Long)]
    heap.walkIndex(btreeAddr, 5, 4 + heap.heapIdLen, "link-index") { rAt =>
      // 4-byte name hash (unused for enumeration), then the heap ID
      out += parseLinkMsg(b, heap.managedObjectAt(rAt + 4))
      ()
    }
    out.result().sortBy(_._1)
  }

  /** DENSE attribute storage (r18): netCDF-4 tracks attribute creation
    * order, so past max_compact (default 8) attributes a latest-format
    * object's attribute messages move into a fractal heap announced by
    * the Attribute Info message — an object the compact-only reader
    * would have silently decoded WITHOUT its CF attributes (units /
    * scale_factor / add_offset), the wrong-values failure mode, not a
    * skip. Enumerated via the name-index v2 B-tree (record type 8:
    * 8-byte managed heap ID + message flags + creation order + name
    * hash); shared attribute messages (flag bit) reject by name. */
  private def readDenseAttrs(b: Buf, fheapAddr: Long, btreeAddr: Long): Seq[H5Attr] = {
    val heap = new FHeap(b, fheapAddr)
    require(heap.heapIdLen == 8,
      s"attribute fractal heap id length ${heap.heapIdLen} != 8")
    val out = Seq.newBuilder[H5Attr]
    heap.walkIndex(btreeAddr, 8, 8 + 1 + 4 + 4, "attribute-index") { rAt =>
      val msgFlags = b.u8(rAt + 8)
      require(msgFlags == 0,
        s"shared attribute message (flags 0x${msgFlags.toHexString}) unsupported")
      parseAttr(b, heap.managedObjectAt(rAt)).foreach(out += _)
    }
    out.result()
  }

  /** Overflow-safe address validation: `v` must address `need` bytes
    * inside a `len`-byte stream. Written as a subtraction (`v <= len -
    * need`) rather than `v + need <= len` so a hostile header carrying an
    * address near Long.MAX cannot wrap the sum positive and slip past the
    * check — and the Int truncation the caller performs is proven safe
    * (0 <= v <= len <= Int.MAX) BEFORE it happens, so corrupted streams
    * reject with this named reason instead of a raw
    * IndexOutOfBoundsException from a silent `.toInt`. */
  /** Resolve one GLOBAL HEAP object (GCOL collection, spec §III.E) —
    * the store behind vlen attribute data ([[parseAttr]]'s
    * `DIMENSION_LIST` branch). Returns the object's data offset after
    * verifying it carries at least `need` bytes. Objects are walked in
    * file order (16-byte headers, data padded to 8); index 0 is the
    * free-space terminator. */
  private def globalHeapObject(b: Buf, collAddr: Long, index: Int,
                               need: Long): Int = {
    val at = checkedAt(collAddr, 16, b.bytes.length, "global heap collection")
    require(b.ascii(at, 4) == "GCOL", "bad global heap collection signature")
    require(b.u8(at + 4) == 1,
      s"global heap version ${b.u8(at + 4)} unsupported")
    val collSize = b.u64(at + 8)
    require(collSize >= 16 && collSize <= b.bytes.length - at,
      s"global heap collection size $collSize outside stream")
    val end = at + collSize.toInt
    var p = at + 16
    while (p + 16 <= end) {
      val idx = b.u16(p)
      val size = b.u64(p + 8)
      if (idx == 0) p = end // free-space object: no objects follow
      else if (idx == index) {
        require(size >= need && p + 16 + size <= end,
          s"global heap object $index carries $size bytes, need $need")
        return p + 16
      } else {
        require(size >= 0 && size <= end - p - 16,
          s"global heap object $idx size $size outside collection")
        p += 16 + ((size + 7) / 8 * 8).toInt
      }
    }
    throw new IllegalArgumentException(
      s"global heap object $index not found in collection at $collAddr")
  }

  private def checkedAt(v: Long, need: Long, len: Int, what: String): Int = {
    require(v >= 0 && need >= 0 && v <= len.toLong - need,
      s"$what at $v (+$need bytes) outside stream length $len")
    v.toInt
  }

  /** Bob Jenkins' lookup3 `hashlittle` — the metadata checksum every
    * version-2+ HDF5 structure carries (superblock v2/v3, OHDR/OCHK).
    * Public algorithm (lookup3.c, public domain; referenced by the HDF5
    * File Format Specification as the "Jenkins lookup3" checksum);
    * little-endian word reads, zero-padded tail, pinned against the
    * published self-test vector in NetCdf4Spec. */
  private[graft] def lookup3(bytes: Array[Byte], off: Int, len: Int,
                             init: Int = 0): Int = {
    def rol(x: Int, k: Int): Int = Integer.rotateLeft(x, k)
    def word(p: Int, avail: Int): Int = {
      var w = 0
      var i = 0
      while (i < 4 && i < avail) { w |= (bytes(p + i) & 0xff) << (8 * i); i += 1 }
      w
    }
    var a = 0xdeadbeef + len + init
    var b = a
    var c = a
    var p = off
    var rem = len
    while (rem > 12) {
      a += word(p, 4); b += word(p + 4, 4); c += word(p + 8, 4)
      a -= c; a ^= rol(c, 4); c += b
      b -= a; b ^= rol(a, 6); a += c
      c -= b; c ^= rol(b, 8); b += a
      a -= c; a ^= rol(c, 16); c += b
      b -= a; b ^= rol(a, 19); a += c
      c -= b; c ^= rol(b, 4); b += a
      p += 12; rem -= 12
    }
    if (rem > 0) {
      a += word(p, rem)
      b += word(p + 4, rem - 4)
      c += word(p + 8, rem - 8)
      c ^= b; c -= rol(b, 14)
      a ^= c; a -= rol(c, 11)
      b ^= a; b -= rol(a, 25)
      c ^= b; c -= rol(b, 16)
      a ^= c; a -= rol(c, 4)
      b ^= a; b -= rol(a, 14)
      c ^= b; c -= rol(b, 24)
    }
    c
  }

  /** Verify the 4-byte lookup3 checksum stored at `off + len` over
    * `[off, off + len)` — reject, by name, rather than misread. */
  private def checkLookup3(b: Buf, off: Int, len: Int, what: String): Unit = {
    checkedAt(off.toLong, len.toLong + 4, b.bytes.length, what)
    val want = b.u32(off + len)
    val got = lookup3(b.bytes, off, len) & 0xffffffffL
    require(got == want,
      f"$what checksum mismatch (stored 0x$want%08x, computed 0x$got%08x)")
  }

  private final class Buf(val bytes: Array[Byte]) {
    private val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def u8(p: Int): Int = bytes(p) & 0xff
    def u16(p: Int): Int = bb.getShort(p) & 0xffff
    def u32(p: Int): Long = bb.getInt(p) & 0xffffffffL
    def u64(p: Int): Long = bb.getLong(p)
    /** Little-endian unsigned integer of `n` (1-8) bytes. */
    def uvar(p: Int, n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v |= (bytes(p + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
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
  // nested-group names are path-prefixed ("fc/temp") — CF-name matching
  // goes by the LEAF segment, so a grouped cube's variables and
  // coordinates resolve exactly like a flat one's
  private def leafName(n: String): String =
    n.substring(n.lastIndexOf('/') + 1).toLowerCase

  /** Decode staged NetCDF-4 cube bytes to the pipeline's long format —
    * schema- and semantics-identical to [[NetCdf.decodeCube]] (shared
    * [[NetCdf.cubeFrame]] builder): same data-variable selection, CF time
    * units, packing and fill masking, and the same CF
    * `coordinates`-attribute handling (2-D lat/lon auxiliary coordinates
    * become extra `lat`/`lon` columns). Axis positions resolve through
    * the data variable's `DIMENSION_LIST` dimension scales where present
    * (r19 — xarray's semantics, covering renamed/phony/transposed
    * coords), else by matching coordinate-dataset lengths against the
    * data shape (conventional (time, y, x) order on ties). */
  def decodeCube(
      spark: SparkSession, collection: String, parameter: String,
      bytes: Array[Byte]): DataFrame = {
    val f = parse(bytes)
    // variables listed in any CF `coordinates` attribute are coordinates,
    // not data — a 2-D lat(y,x) must never be picked as the data variable
    val auxListed = f.datasets.flatMap(_.attr("coordinates"))
      .flatMap(_.text.trim.split("\\s+")).map(_.toLowerCase).toSet
    val gridded = f.datasets.filter(d =>
      !coordNames.contains(leafName(d.name)) &&
        !auxListed.contains(leafName(d.name)) && d.shape.size >= 2)
    require(gridded.nonEmpty, "no gridded data variable in NetCDF-4 stream")
    def isParam(v: H5Dataset): Boolean =
      v.name.equalsIgnoreCase(parameter) || leafName(v.name) == parameter.toLowerCase
    gridded.find(isParam).foreach { v =>
      require(v.shape.size <= 3,
        s"variable '$parameter' has rank ${v.shape.size}; decodeCube " +
          "supports rank 2 (y,x) and rank 3 (time,y,x)")
    }
    val candidates = gridded.filter(_.shape.size <= 3)
    require(candidates.nonEmpty,
      s"only rank-${gridded.map(_.shape.size).max} data variables " +
        "present; decodeCube supports rank 2 (y,x) and rank 3 (time,y,x)")
    val data = candidates
      .sortBy(v => (if (isParam(v)) 0 else 1, -v.shape.size))
      .head
    val rank = data.shape.size
    val shape = data.shape.map(_.toInt)

    // netCDF-4 writes a phony dimension-scale dataset for every dim
    // that has no coordinate variable; its values are meaningless, so
    // the axis falls back to an index coordinate — xarray's behavior.
    def phony(d: H5Dataset): Boolean =
      d.attr("NAME").exists(_.text.startsWith(
        "This is a netCDF dimension but not a netCDF variable"))

    // Axis resolution, DIMENSION_LIST first (xarray's dimension-scale
    // semantics, ingestor.py:200 `xarray.open_dataset`): when the data
    // variable carries the vlen-of-object-reference attribute, axis i's
    // coordinate IS the dimension-scale dataset its i-th element
    // references — whatever the scale is NAMED, which is exactly the
    // shape (renamed coords) name matching cannot see. Classification
    // of which referenced axis is time/y/x goes by leaf name or CF
    // units (" since " / degrees_east / degrees_north), then falls to
    // conventional (time, y, x) position on unclassifiable scales.
    val dimScales: Option[Seq[Option[H5Dataset]]] =
      data.attr("DIMENSION_LIST").filter(_.refs.size == rank).map { a =>
        val byAddr = f.datasets.map(d => d.headerAddr -> d).toMap
        val scales = a.refs.map(_.headOption.flatMap(byAddr.get).filterNot(phony))
        scales.zipWithIndex.foreach { case (ds, i) =>
          ds.foreach(sc => require(
            sc.shape.size == 1 && sc.shape.head == shape(i),
            s"DIMENSION_LIST scale '${sc.name}' shape ${sc.shape.mkString("x")} " +
              s"does not match axis $i of data shape ${shape.mkString("x")}"))
        }
        scales
      }
    val (tPos, yPos, xPos, timeDs, yDs, xDs) = dimScales match {
      case Some(scales) =>
        def unitsOf(d: H5Dataset) = d.attr("units").map(_.text).getOrElse("")
        def isTime(d: H5Dataset) =
          TimeNames.contains(leafName(d.name)) || unitsOf(d).contains(" since ")
        def isX(d: H5Dataset) =
          XNames.contains(leafName(d.name)) || unitsOf(d).startsWith("degrees_east")
        def isY(d: H5Dataset) =
          YNames.contains(leafName(d.name)) || unitsOf(d).startsWith("degrees_north")
        val tP =
          if (rank == 3)
            Some(scales.indexWhere(_.exists(isTime)) match {
              // no time-classifiable scale: take the first axis whose
              // scale is NOT X/Y-classified rather than blindly axis 0 —
              // a (y, x, time) cube whose time scale is renamed and
              // unitless must not map latitudes into timestamps
              case -1 => (0 until rank).find(i =>
                  !scales(i).exists(d => isX(d) || isY(d))).getOrElse(0)
              case i => i
            })
          else None
        val rest = (0 until rank).filterNot(tP.contains)
        // an X-classified scale pins x; else the LAST non-Y axis is x
        // (conventional row-major (…, y, x) order) — so a transposed
        // (x, y) grid with classified scales decodes correctly too
        val xP = rest.find(i => scales(i).exists(isX))
          .orElse(rest.reverse.find(i => !scales(i).exists(isY)))
          .getOrElse(rest.last)
        val yP = rest.filterNot(_ == xP).head
        (tP, yP, xP, tP.flatMap(scales(_)), scales(yP), scales(xP))
      case None =>
        // coordinates resolve inside the data variable's own group
        // first (xarray's group= shape: coords live with their
        // variables), then fall back to any group — root-level shared
        // coords included
        val groupPrefix = data.name.substring(0, data.name.lastIndexOf('/') + 1)
        def coord(names: Set[String]): Option[H5Dataset] =
          f.datasets.find(d => d.shape.size == 1 &&
              d.name.startsWith(groupPrefix) && names.contains(leafName(d.name)))
            .orElse(f.datasets.find(d =>
              d.shape.size == 1 && names.contains(leafName(d.name))))
        val timeDs0 = if (rank == 3) coord(TimeNames) else None
        val yDs0 = coord(YNames)
        val xDs0 = coord(XNames)

        // Axis positions: every permutation consistent with the real
        // coords' lengths, preferring conventional (time, y, x) order —
        // shape ties (e.g. a square grid) resolve conventionally rather
        // than failing.
        val axes: Seq[(Option[H5Dataset], Int)] = // (coord, conventional position)
          (timeDs0, yDs0, xDs0) match {
            case _ if rank == 2 => Seq((yDs0, 0), (xDs0, 1))
            case _ => Seq((timeDs0, 0), (yDs0, 1), (xDs0, 2))
          }
        val perm = (0 until rank).permutations
          .map(ps => ps.zip(axes))
          .find(_.forall { case (pos, (ds, conv)) =>
            ds.forall(_.shape.head == shape(pos)) && (ds.nonEmpty || pos == conv)
          })
          .getOrElse(throw new IllegalArgumentException(
            s"coordinate lengths do not match data shape ${shape.mkString("x")}"))
          .map(_._1)
        if (rank == 2) (None, perm(0), perm(1), None, yDs0, xDs0)
        else (Some(perm(0)), perm(1), perm(2), timeDs0, yDs0, xDs0)
    }

    // CF `coordinates` auxiliary coordinates — the [[NetCdf.decodeCube]]
    // dual (xarray attaches these as non-dimension coords,
    // ingestor.py:200): a curvilinear native-CRS cube — exactly what a
    // `harmonie_*` grid looks like before the reference reprojects it —
    // carries 2-D lat(y,x)/lon(y,x) beside its 1-D projection coords.
    // Each listed variable that is a 2-D grid over the (y, x) axes
    // becomes an extra `lat`/`lon` output column. Axis order resolves
    // through the aux variable's own DIMENSION_LIST where present
    // (exact), else by shape against (ny, nx) — square grids default to
    // conventional (y, x) order. Named skips: non-geographic aux names
    // and grids whose shape matches neither order.
    val aux: Seq[NetCdf.AuxCoord] = {
      val listed = data.attr("coordinates").map(_.text.trim).filter(_.nonEmpty)
        .map(_.split("\\s+").toSeq).getOrElse(Seq.empty)
      val groupPrefix = data.name.substring(0, data.name.lastIndexOf('/') + 1)
      val byAddr = f.datasets.map(d => d.headerAddr -> d).toMap
      val nYd = shape(yPos); val nXd = shape(xPos)
      listed.flatMap { nm =>
        f.datasets.find(_.name == groupPrefix + nm)
          .orElse(f.datasets.find(d => leafName(d.name) == nm.toLowerCase))
          .filter(_.shape.size == 2).flatMap { v =>
            val u = v.attr("units").map(_.text).getOrElse("")
            val ln = nm.toLowerCase
            val outCol =
              if (ln.startsWith("lat") || u.startsWith("degrees_north")) Some("lat")
              else if (ln.startsWith("lon") || u.startsWith("degrees_east")) Some("lon")
              else None
            outCol.flatMap { c =>
              val sh = v.shape.map(_.toInt)
              val yMajor: Option[Boolean] =
                v.attr("DIMENSION_LIST").filter(_.refs.size == 2).flatMap { a =>
                  val s0 = a.refs.head.headOption.flatMap(byAddr.get).map(_.headerAddr)
                  if (s0.isDefined && s0 == yDs.map(_.headerAddr)) Some(true)
                  else if (s0.isDefined && s0 == xDs.map(_.headerAddr)) Some(false)
                  else None
                }.orElse {
                  if (sh == Seq(nYd, nXd)) Some(true) // square: conventional
                  else if (sh == Seq(nXd, nYd)) Some(false)
                  else None
                }
              yMajor
                .filter(m => sh == (if (m) Seq(nYd, nXd) else Seq(nXd, nYd)))
                .map {
                  case true  => NetCdf.AuxCoord(c, readValues(f, v), sh(1), 1)
                  case false => NetCdf.AuxCoord(c, readValues(f, v), 1, sh(1))
                }
            }
          }
      }.distinctBy(_.name).sortBy(_.name) // canonical column order: lat, lon
    }

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
      scale, offset, fill, toEpochSec, aux)
  }

  // -- writer (fixture + sink side) -----------------------------------

  /** A dataset to write. `values` are row-major doubles, narrowed to
    * float32 when `f32`; attrs accept String / Double / Float / Int.
    * `chunk` (rank-length chunk dims) switches the dataset to chunked
    * layout — a v1 chunk B-tree normally, a v4 chunk index under
    * `latest` (single-chunk for a one-cell grid, implicit when
    * unfiltered, fixed array otherwise — libhdf5's fixed-maxdim
    * choices; `idx4` pins a specific index type instead, e.g. a
    * client-0 fixed array for an unfiltered dataset, which libhdf5
    * emits under its default incremental allocation, or 4 = the
    * extensible array libhdf5 picks for an UNLIMITED time maxdim).
    * `filters` is the
    * write-order filter pipeline (1 = deflate, 2 = shuffle — e.g.
    * `Seq(2, 1)` is libnetcdf's shuffle-then-deflate default when both
    * are enabled). */
  /** `maxDims`: per-dim maximums for the dataspace message (−1 = the
    * spec's UNLIMITED value) — lets fixtures declare the unlimited axes
    * that make libhdf5 pick the extensible-array / v2-B-tree chunk
    * indexes, so the reader's maxdims-dependent guards are testable. */
  /** `DIMENSION_LIST` attribute value for [[WriteDs.attrs]]: per-axis
    * dimension-scale dataset NAMES (one scale per axis — the libnetcdf
    * shape), emitted as the vlen-of-object-reference attribute with the
    * reference addresses in a trailing global heap collection — the
    * writer dual of [[parseAttr]]'s vlen branch, which is what pins the
    * renamed-coords decode path offline. */
  case class DimList(dims: Seq[String])

  // internal resolved form: (global heap collection address, first heap
  // object index, axis count) — size-stable w.r.t. the address, so ohdr
  // measurement passes encode it with a placeholder address
  private case class DimListEnc(gheapAt: Long, firstIdx: Int, n: Int)

  case class WriteDs(
      name: String, shape: Seq[Long], values: Array[Double],
      f32: Boolean = false, attrs: Seq[(String, Any)] = Nil,
      chunk: Option[Seq[Int]] = None, filters: Seq[Int] = Nil,
      idx4: Option[Int] = None, maxDims: Option[Seq[Long]] = None,
      // extensible-array data-block page bits (creation parameter,
      // recorded in the EAHD): libhdf5's default 10 pages nothing below
      // ~65k chunks, so paged-EADB fixtures declare a smaller value —
      // the file stays spec-conformant, paging just engages earlier
      eaPageBits: Int = 10)

  /** Serialize the subset: superblock v0, one flat symbol-table root
    * group, v1 object headers, contiguous little-endian data. Layout is
    * computed in one forward pass (every block's size is known before
    * its address is needed). With `latest = true`, the same datasets are
    * framed the "latest format" way instead — superblock v3, version-2
    * (OHDR) object headers with lookup3 checksums, and link messages in
    * place of the symbol-table b-tree/heap/SNOD — which is the writer
    * dual of [[readHeaderV2]] and what pins the v2 decode path offline. */
  def write(datasets: Seq[WriteDs], latest: Boolean = false): Array[Byte] = {
    require(datasets.nonEmpty, "empty HDF5 file")
    // the V1 superblock declares group-leaf K=4, which caps one symbol
    // node at 2K=8 entries; a flat cube needs 4 (time/y/x/data), so one
    // SNOD suffices — reject rather than emit a spec-violating oversized
    // node. Latest-format groups have no such node: past 8 links they
    // switch to DENSE storage below, exactly libhdf5's phase change.
    require(latest || datasets.size <= 8,
      s"v1 writer subset emits one symbol node (max 8 datasets), got ${datasets.size}")
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

    val sbSize = if (latest) 48L else 96L
    val rootOhdrAt = sbSize
    // NESTED GROUPS (latest only): a '/' in a dataset name places it
    // under intermediate groups, each its own v2 header of a link-info
    // message (compact storage, no fractal heap — what libhdf5 writes
    // below the dense threshold) plus one hard link per child
    val groupPaths: Seq[String] = sorted.flatMap { d =>
      val segs = d.name.split('/')
      (1 until segs.length).map(i => segs.take(i).mkString("/"))
    }.distinct.sorted
    require(groupPaths.isEmpty || latest,
      "nested-group fixtures require latest = true (v1 writer emits one flat SNOD)")
    def parentOf(path: String): String = {
      val i = path.lastIndexOf('/'); if (i < 0) "" else path.substring(0, i)
    }
    def shortOf(path: String): String = path.substring(path.lastIndexOf('/') + 1)
    // children (link name, full path) of group `g` ("" = root)
    def childrenOf(g: String): Seq[(String, String)] =
      (groupPaths.filter(parentOf(_) == g).map(p => (shortOf(p), p)) ++
        sorted.map(_.name).filter(parentOf(_) == g).map(n => (shortOf(n), n)))
        .sortBy(_._1)
    // link info: version 0, flags 0, fractal heap + name btree addresses
    def linkInfoBodyAt(fheap: Long, bt2: Long): Array[Byte] = {
      val o = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
      o.put(0.toByte).put(0.toByte).putLong(fheap).putLong(bt2)
      o.array()
    }
    val linkInfoBody = linkInfoBodyAt(Undef, Undef)
    // DENSE link storage (r18): past MaxCompact links a latest-format
    // group's link messages move into a fractal heap + name-index v2
    // B-tree, mirroring libhdf5's dense-link creation parameters
    // (width 4, start 512, max direct 64K, 32-bit heap offsets,
    // 4096-byte max managed object → 7-byte heap ids, CHECKSUMMED
    // direct blocks, 512-byte index nodes, compact→dense at 8)
    val MaxCompact = 8
    def isDense(g: String): Boolean = latest && childrenOf(g).size > MaxCompact
    val HeapW = 4; val HeapStart = 512L; val HeapMaxDirect = 65536L
    val HeapOffSize = 4; val HeapLenSize = 2
    val HeapIdLen = 1 + HeapOffSize + HeapLenSize
    val HeapDbHdr = 13 + HeapOffSize + 4 // checksummed direct blocks
    val LinkBt2NodeSize = 512
    val LinkBt2RecSize = 4 + HeapIdLen
    def heapRowSize(r: Int): Long = if (r < 2) HeapStart else HeapStart << (r - 1)
    // greedy packing of one dense group's link bodies into direct
    // blocks (objects never cross a block boundary — the H5HF rule)
    case class DensePlan(offsets: Seq[Long], blocks: Seq[(Int, Long, Long)],
                         rootRows: Int, freeSpace: Long, recSize: Int) {
      // blocks: (row, heap offset, size), enumerated row-major — heap
      // offsets are contiguous in that order by construction
      def allocated: Long = blocks.map(_._3).sum
      def fhibSize: Long =
        if (rootRows == 0) 0L else 13L + HeapOffSize + rootRows.toLong * HeapW * 8 + 4
      def heapSize: Long = 146L + fhibSize + allocated
      def bt2Size: Long = 38L + 6 + offsets.size * recSize + 4
    }
    def densePack(sizes: Seq[Int], recSize: Int): DensePlan = {
      require(sizes.size <= (LinkBt2NodeSize - 10) / recSize,
        s"dense fixture subset caps objects at one index leaf, got ${sizes.size}")
      var blocks = Vector.empty[(Int, Long, Long)]
      var idx = -1
      var cur = 0L; var curEnd = 0L; var free = 0L
      def newBlock(): Unit = {
        idx += 1
        val row = idx / HeapW
        require(heapRowSize(row) <= HeapMaxDirect,
          "dense fixture outgrew the direct-block rows")
        val off = blocks.lastOption.map(b => b._2 + b._3).getOrElse(0L)
        blocks = blocks :+ ((row, off, heapRowSize(row)))
        free += curEnd - cur
        cur = off + HeapDbHdr
        curEnd = off + heapRowSize(row)
      }
      newBlock()
      val offsets = sizes.map { s =>
        require(HeapDbHdr + s <= HeapStart, s"dense object of $s bytes exceeds a direct block")
        if (cur + s > curEnd) newBlock()
        val at = cur; cur += s; at
      }
      free += curEnd - cur
      DensePlan(offsets, blocks,
        if (blocks.size == 1) 0 else blocks.last._1 + 1, free, recSize)
    }
    def densePlan(g: String): DensePlan =
      densePack(childrenOf(g).map { case (sn, _) => linkBody(sn, 0L).length },
        LinkBt2RecSize)
    val denseOrder: Seq[String] = ("" +: groupPaths).filter(isDense)
    val densePlans: Map[String, DensePlan] =
      denseOrder.map(g => g -> densePlan(g)).toMap
    // dense ATTRIBUTE stores: a latest-format dataset past MaxCompact
    // attributes moves its 0x000C messages into a fractal heap too
    // (netCDF-4 tracks attribute creation order, so libhdf5's attribute
    // phase change applies) — same machinery, 8-byte heap ids (offset 4
    // + length 3), record type 8 of 17 bytes (id + flags + creation
    // order + name hash)
    val AttrIdLen = 8
    val AttrBt2RecSize = AttrIdLen + 1 + 4 + 4
    // DIMENSION_LIST attrs: one global-heap object per (dataset, axis)
    // in declaration order, holding that axis' dimension-scale object
    // reference; the GCOL collection itself lands after the data blobs,
    // so its address reaches the encoder through `gcolAddr`, set before
    // final emission (attr bodies are size-stable w.r.t. it — the ohdr
    // measurement passes encode a placeholder address)
    val dimRefNames: Seq[String] = sorted.flatMap(_.attrs.collect {
      case (_, DimList(dims)) => dims
    }).flatten
    dimRefNames.foreach(dn => require(datasets.exists(_.name == dn),
      s"DIMENSION_LIST references unknown dataset '$dn'"))
    require(sorted.forall(_.attrs.count(_._2.isInstanceOf[DimList]) <= 1),
      "at most one DIMENSION_LIST attribute per dataset")
    val nDimRefs = dimRefNames.size
    val dimListBase: Map[String, Int] = {
      var next = 1
      sorted.flatMap(d => d.attrs.collectFirst { case (_, DimList(dims)) =>
        val base = next; next += dims.size; d.name -> base
      }).toMap
    }
    var gcolAddr = 0L
    def resolveAttr(dsName: String)(a: (String, Any)): (String, Any) = a match {
      case (an, DimList(dims)) =>
        (an, DimListEnc(gcolAddr, dimListBase(dsName), dims.size))
      case other => other
    }
    def attrBodies(d: WriteDs): Seq[Array[Byte]] =
      d.attrs.map(resolveAttr(d.name)).map { case (an, av) => attrBody(an, av) }
    def isDenseAttr(d: WriteDs): Boolean = latest && d.attrs.size > MaxCompact
    val denseAttrOrder: Seq[WriteDs] = sorted.filter(isDenseAttr)
    val denseAttrPlans: Map[String, DensePlan] = denseAttrOrder.map(d =>
      d.name -> densePack(attrBodies(d).map(_.length), AttrBt2RecSize)).toMap
    def groupMsgs(g: String, addrs: Map[String, Long],
                  dense: Map[String, (Long, Long)]): Seq[(Int, Array[Byte])] =
      if (isDense(g)) {
        val (fh, bt) = dense.getOrElse(g, (0L, 0L))
        Seq((0x0002, linkInfoBodyAt(fh, bt)))
      } else (0x0002, linkInfoBody) +: childrenOf(g).map { case (s, p) =>
        (0x0006, linkBody(s, addrs.getOrElse(p, 0L)))
      }
    def groupV2(g: String, addrs: Map[String, Long],
                dense: Map[String, (Long, Long)]): Array[Byte] =
      ohdrV2(groupMsgs(g, addrs, dense))
    // latest-format root: hard-link messages per root-level child (or
    // the dense link-info alone); sizes are address-independent, so a
    // placeholder measures them
    def rootV2(addrs: Map[String, Long],
               dense: Map[String, (Long, Long)]): Array[Byte] =
      if (isDense("")) ohdrV2(groupMsgs("", addrs, dense))
      else ohdrV2(childrenOf("").map { case (s, p) =>
        (0x0006, linkBody(s, addrs.getOrElse(p, 0L)))
      })
    val rootOhdr =
      if (latest) rootV2(Map.empty, Map.empty)
      else ohdrBytes(Seq(msg(0x0011, new Array[Byte](16)))) // patched later
    val groupSizes = groupPaths.map(g => groupV2(g, Map.empty, Map.empty).length.toLong)
    val groupAts = groupSizes.scanLeft(rootOhdrAt + rootOhdr.length)(_ + _).init
    val denseSizes = denseOrder.map(g =>
      densePlans(g).heapSize + densePlans(g).bt2Size)
    val denseAts = denseSizes
      .scanLeft(rootOhdrAt + rootOhdr.length + groupSizes.sum)(_ + _).init
    val denseAddrs: Map[String, (Long, Long)] =
      denseOrder.zip(denseAts).map { case (g, at) =>
        g -> ((at, at + densePlans(g).heapSize))
      }.toMap
    val denseAttrSizes = denseAttrOrder.map(d =>
      denseAttrPlans(d.name).heapSize + denseAttrPlans(d.name).bt2Size)
    val denseAttrAts = denseAttrSizes
      .scanLeft(rootOhdrAt + rootOhdr.length + groupSizes.sum + denseSizes.sum)(_ + _).init
    val denseAttrAddrs: Map[String, (Long, Long)] =
      denseAttrOrder.zip(denseAttrAts).map { case (d, at) =>
        d.name -> ((at, at + denseAttrPlans(d.name).heapSize))
      }.toMap
    val btreeAt = rootOhdrAt + rootOhdr.length + groupSizes.sum +
      denseSizes.sum + denseAttrSizes.sum
    val btreeSize = if (latest) 0L else 24L + 8 + 16 // header + key0 + (child0, key1)
    val heapAt = btreeAt + btreeSize
    val heapHdrSize = if (latest) 0L else 32L
    val heapDataAt = heapAt + heapHdrSize
    val snodAt = heapDataAt + (if (latest) 0L else heapData.length.toLong)
    val snodSize = if (latest) 0L else 8L + 40L * sorted.size

    // latest-format chunk index selection — mirrors libhdf5's fixed-
    // maxdim choices: one-cell grid → single chunk; unfiltered →
    // implicit; filtered multi-chunk → fixed array
    def chunkIndexType(d: WriteDs, nChunks: Int): Int =
      d.idx4.getOrElse(
        if (nChunks == 1) 1 else if (d.filters.isEmpty) 2 else 3)
    def faEntrySize(d: WriteDs): Int = if (d.filters.isEmpty) 8 else 20
    def faSize(d: WriteDs, nChunks: Int): Long =
      28L + faDbSize(faEntrySize(d), nChunks)
    // dataset object headers: size-stable w.r.t. the data/btree address,
    // so measure with a placeholder then re-emit with the real address
    def dsMsgs(d: WriteDs, plan: Option[Seq[(Seq[Long], Array[Byte])]],
               dataAddr: Long,
               denseAttr: Option[(Long, Long)]): Seq[(Int, Array[Byte])] = {
      val n = d.shape.product.max(1L)
      val elem = if (d.f32) 4 else 8
      val layoutMsg = (d.chunk, plan) match {
        case (Some(cd), Some(blobs)) if latest =>
          val idxType = chunkIndexType(d, blobs.size)
          val single =
            if (idxType == 1 && d.filters.nonEmpty)
              Some((blobs.head._2.length.toLong, 0L))
            else None
          (0x0008, chunkedLayoutBodyV4(idxType, dataAddr, cd, elem, single))
        case (Some(cd), _) => (0x0008, chunkedLayoutBody(dataAddr, cd, elem))
        case _ => (0x0008, layoutBody(dataAddr, n * elem))
      }
      val filterMsgs =
        if (d.chunk.isDefined && d.filters.nonEmpty)
          Seq((0x000B, filterPipelineBody(d.filters, elem)))
        else Nil
      // past MaxCompact attributes (latest): ONE attribute-info message
      // pointing at the dense store instead of the 0x000C messages —
      // the body layout matches link info at flags 0, so it is reused
      val attrMsgs = denseAttr match {
        case Some((fh, bt)) => Seq((0x0015, linkInfoBodyAt(fh, bt)))
        case None => d.attrs.map(resolveAttr(d.name))
          .map { case (an, av) => (0x000C, attrBody(an, av)) }
      }
      Seq(
        (0x0001, dataspaceBody(d.shape, d.maxDims)),
        (0x0003, datatypeBody(d.f32)),
        layoutMsg) ++ filterMsgs ++ attrMsgs
    }
    def dsOhdr(d: WriteDs, plan: Option[Seq[(Seq[Long], Array[Byte])]],
               dataAddr: Long,
               denseAttr: Option[(Long, Long)]): Array[Byte] = {
      val ms = dsMsgs(d, plan, dataAddr, denseAttr)
      if (latest) ohdrV2(ms)
      else ohdrBytes(ms.map { case (t, body) => msg(t, body) })
    }
    def chunkBtreeSize(d: WriteDs, nChunks: Int): Long = {
      val keySize = 8 + 8 * (d.shape.size + 1)
      24L + nChunks * (keySize + 8) + keySize
    }
    // chunked datasets: pre-filter every chunk so its on-disk size is
    // known before addresses are assigned (the one-forward-pass rule)
    val plans: Seq[Option[Seq[(Seq[Long], Array[Byte])]]] =
      sorted.map(d => d.chunk.map(_ => chunkBlobs(d, latestCap = latest)))
    val ohdrSizes = sorted.zip(plans).map { case (d, pl) =>
      dsOhdr(d, pl, 0L,
        if (isDenseAttr(d)) Some((0L, 0L)) else None).length.toLong
    }
    val ohdrAts = ohdrSizes.scanLeft(snodAt + snodSize)(_ + _).init
    var dataAt = align8(snodAt + snodSize + ohdrSizes.sum)
    val dataAts = sorted.zip(plans).map { case (d, plan) =>
      val at = dataAt
      plan match {
        case Some(blobs) if latest =>
          chunkIndexType(d, blobs.size) match {
            case 1 => dataAt += align8(blobs.head._2.length.toLong)
            case 2 => // implicit: chunks TIGHT (addr + i*chunkBytes)
              dataAt += align8(blobs.map(_._2.length.toLong).sum)
            case 4 => dataAt += eaSize(faEntrySize(d), blobs.size, d.eaPageBits) +
              blobs.map(b => align8(b._2.length.toLong)).sum
            case 5 => dataAt += bt2Size(d.shape.size, d.filters.nonEmpty, blobs.size) +
              blobs.map(b => align8(b._2.length.toLong)).sum
            case _ => dataAt += align8(faSize(d, blobs.size)) +
              blobs.map(b => align8(b._2.length.toLong)).sum
          }
        case Some(blobs) =>
          dataAt += align8(chunkBtreeSize(d, blobs.size)) +
            blobs.map(b => align8(b._2.length.toLong)).sum
        case None =>
          dataAt += align8(d.shape.product.max(1L) * (if (d.f32) 4 else 8))
      }
      at
    }
    // global heap collection (GCOL) for DIMENSION_LIST references: one
    // 24-byte object (16-byte header + one padded 8-byte object
    // reference) per (dataset, axis) + a 16-byte free-space terminator
    val gcolAt = dataAt
    val gcolSize = if (nDimRefs == 0) 0L else 16L + 24L * nDimRefs + 16L
    gcolAddr = if (nDimRefs == 0) 0L else gcolAt
    val eof = gcolAt + gcolSize

    val out = ByteBuffer.allocate(eof.toInt).order(ByteOrder.LITTLE_ENDIAN)
    if (latest) {
      // superblock v3: fixed 48 bytes, lookup3-checksummed
      out.put(Magic)
      out.put(3.toByte).put(8.toByte).put(8.toByte).put(0.toByte)
      out.putLong(0L).putLong(Undef).putLong(eof).putLong(rootOhdrAt)
      out.putInt(lookup3(out.array(), 0, 44))
      // root + group object headers: link messages with the real addresses
      val addrs = sorted.map(_.name).zip(ohdrAts).toMap ++
        groupPaths.zip(groupAts).toMap
      out.position(rootOhdrAt.toInt)
      out.put(rootV2(addrs, denseAddrs))
      groupPaths.zip(groupAts).foreach { case (g, at) =>
        out.position(at.toInt)
        out.put(groupV2(g, addrs, denseAddrs))
      }
      // dense stores: fractal heap (FRHP + FHIB/FHDBs with the link or
      // attribute messages as managed objects) + name-index v2 B-tree;
      // putRec writes one (hash-sorted) index record given
      // (buf, name hash, heap offset, object length, original index)
      def denseStoreBytes(plan: DensePlan, heapAt: Long, idLen: Int,
          names: Seq[String], bodies: Seq[Array[Byte]], recType: Int,
          putRec: (ByteBuffer, Long, Long, Int, Int) => Unit): Array[Byte] = {
        val o = ByteBuffer.allocate((plan.heapSize + plan.bt2Size).toInt)
          .order(ByteOrder.LITTLE_ENDIAN)
        o.put("FRHP".getBytes(US_ASCII)).put(0.toByte)
        o.putShort(idLen.toShort).putShort(0.toShort).put(0x2.toByte)
        o.putInt(4096) // max managed object size
        o.putLong(0L).putLong(Undef) // next huge id, huge-object bt2
        o.putLong(plan.freeSpace).putLong(Undef) // free space, fs manager
        o.putLong(plan.allocated).putLong(plan.allocated) // managed, allocated
        o.putLong(plan.allocated) // direct block iterator offset
        o.putLong(bodies.size.toLong) // managed object count
        o.putLong(0L).putLong(0L).putLong(0L).putLong(0L) // huge/tiny stats
        o.putShort(HeapW.toShort).putLong(HeapStart).putLong(HeapMaxDirect)
        o.putShort(32.toShort) // max heap size (bits)
        o.putShort(1.toShort)  // starting rows in a root indirect block
        o.putLong(heapAt + 146) // root block address
        o.putShort(plan.rootRows.toShort)
        o.putInt(lookup3(o.array(), 0, 142))
        val blocksFileAt = plan.blocks.scanLeft(146L + plan.fhibSize) {
          case (at, (_, _, sz)) => at + sz
        }.init
        if (plan.rootRows > 0) {
          o.position(146)
          o.put("FHIB".getBytes(US_ASCII)).put(0.toByte).putLong(heapAt)
          o.putInt(0) // root block heap offset
          (0 until plan.rootRows * HeapW).foreach { k =>
            o.putLong(if (k < plan.blocks.size) heapAt + blocksFileAt(k) else Undef)
          }
          o.putInt(lookup3(o.array(), 146, (plan.fhibSize - 4).toInt))
        }
        // direct blocks: objects land at (heap offset − block offset);
        // the checksum covers the WHOLE block with its field zeroed
        // (H5HF's rule), so compute over the zero placeholder
        plan.blocks.zipWithIndex.foreach { case ((_, blkOff, sz), k) =>
          val at = blocksFileAt(k).toInt
          o.position(at)
          o.put("FHDB".getBytes(US_ASCII)).put(0.toByte).putLong(heapAt)
          o.putInt(blkOff.toInt).putInt(0)
          bodies.zip(plan.offsets).foreach { case (body, off) =>
            if (off >= blkOff && off < blkOff + sz) {
              o.position(at + (off - blkOff).toInt); o.put(body)
            }
          }
          val cs = lookup3(o.array(), at, sz.toInt)
          o.position(at + 13 + HeapOffSize); o.putInt(cs)
        }
        // name index: BTHD + one BTLF of (lookup3 name hash, heap id)
        // records in unsigned-hash order
        val bthdAt = plan.heapSize.toInt
        o.position(bthdAt)
        o.put("BTHD".getBytes(US_ASCII)).put(0.toByte).put(recType.toByte)
        o.putInt(LinkBt2NodeSize)
        o.putShort(plan.recSize.toShort).putShort(0.toShort)
        o.put(100.toByte).put(40.toByte) // split/merge percents
        o.putLong(heapAt + plan.heapSize + 38)
        o.putShort(bodies.size.toShort)
        o.putLong(bodies.size.toLong)
        o.putInt(lookup3(o.array(), bthdAt, 34))
        val lfAt = bthdAt + 38
        o.position(lfAt)
        o.put("BTLF".getBytes(US_ASCII)).put(0.toByte).put(recType.toByte)
        val recs = names.indices.map { i =>
          val nb = names(i).getBytes(US_ASCII)
          (lookup3(nb, 0, nb.length) & 0xffffffffL,
            plan.offsets(i), bodies(i).length, i)
        }.sortBy(_._1)
        recs.foreach { case (hash, off, len, i) => putRec(o, hash, off, len, i) }
        o.putInt(lookup3(o.array(), lfAt, 6 + recs.size * plan.recSize))
        o.array()
      }
      denseOrder.foreach { g =>
        val at = denseAddrs(g)._1
        val ch = childrenOf(g)
        out.position(at.toInt)
        out.put(denseStoreBytes(densePlans(g), at, HeapIdLen,
          ch.map(_._1), ch.map { case (sn, p) => linkBody(sn, addrs(p)) }, 5,
          // record type 5: name hash, then the 7-byte managed heap id
          (o, hash, off, len, _) => {
            o.putInt(hash.toInt)
            o.put(0.toByte)         // managed heap id, version 0
            o.putInt(off.toInt)     // 4-byte heap offset
            o.putShort(len.toShort) // 2-byte length
            ()
          }))
      }
      denseAttrOrder.foreach { d =>
        val at = denseAttrAddrs(d.name)._1
        out.position(at.toInt)
        out.put(denseStoreBytes(denseAttrPlans(d.name), at, AttrIdLen,
          d.attrs.map(_._1), attrBodies(d), 8,
          // record type 8: 8-byte managed heap id (offset 4 + length 3),
          // message flags, creation order, name hash
          (o, hash, off, len, i) => {
            o.put(0.toByte)     // managed heap id, version 0
            o.putInt(off.toInt) // 4-byte heap offset
            o.put((len & 0xff).toByte).put(((len >> 8) & 0xff).toByte)
              .put(((len >> 16) & 0xff).toByte) // 3-byte length
            o.put(0.toByte)     // message flags: not shared
            o.putInt(i)         // creation order
            o.putInt(hash.toInt)
            ()
          }))
      }
    } else {
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
    }
    // dataset headers + data (contiguous blob, chunk btree + blobs, or a
    // latest-format chunk index + blobs)
    sorted.lazyZip(ohdrAts).lazyZip(dataAts).lazyZip(plans).foreach { (d, hdrAt, dAt, plan) =>
      out.position(hdrAt.toInt)
      out.put(dsOhdr(d, plan, dAt, denseAttrAddrs.get(d.name)))
      plan match {
        case Some(blobs) if latest =>
          chunkIndexType(d, blobs.size) match {
            case 1 => // single chunk: the layout's address IS the blob
              out.position(dAt.toInt)
              out.put(blobs.head._2)
            case 2 => // implicit: unfiltered chunks tight, row-major
              out.position(dAt.toInt)
              blobs.foreach(bl => out.put(bl._2))
            case 4 => // extensible array: EAHD + EAIB + EASB/EADBs, blobs after
              var cAt = dAt + eaSize(faEntrySize(d), blobs.size, d.eaPageBits)
              val childAts = blobs.map { case (_, blob) =>
                val a = cAt; cAt += align8(blob.length.toLong); a
              }
              out.position(dAt.toInt)
              out.put(extensibleArrayIndex(dAt, faEntrySize(d),
                if (d.filters.isEmpty) 0 else 1, blobs, childAts, d.eaPageBits))
              blobs.zip(childAts).foreach { case ((_, blob), a) =>
                out.position(a.toInt); out.put(blob)
              }
            case 5 => // v2 B-tree: BTHD + BTIN/BTLF node tree, blobs after
              var cAt = dAt + bt2Size(d.shape.size, d.filters.nonEmpty, blobs.size)
              val childAts = blobs.map { case (_, blob) =>
                val a = cAt; cAt += align8(blob.length.toLong); a
              }
              out.position(dAt.toInt)
              out.put(btree2Index(dAt, d.shape.size, d.filters.nonEmpty,
                d.chunk.get, blobs, childAts))
              blobs.zip(childAts).foreach { case ((_, blob), a) =>
                out.position(a.toInt); out.put(blob)
              }
            case _ => // fixed array: FAHD + FADB, blobs after
              var cAt = dAt + align8(faSize(d, blobs.size))
              val childAts = blobs.map { case (_, blob) =>
                val a = cAt; cAt += align8(blob.length.toLong); a
              }
              out.position(dAt.toInt)
              out.put(fixedArrayIndex(dAt, faEntrySize(d),
                if (d.filters.isEmpty) 0 else 1, blobs, childAts))
              blobs.zip(childAts).foreach { case ((_, blob), a) =>
                out.position(a.toInt); out.put(blob)
              }
          }
        case Some(blobs) =>
          var cAt = dAt + align8(chunkBtreeSize(d, blobs.size))
          val childAts = blobs.map { case (_, blob) =>
            val a = cAt; cAt += align8(blob.length.toLong); a
          }
          out.position(dAt.toInt)
          out.put(chunkBtree(d, blobs, childAts))
          blobs.zip(childAts).foreach { case ((_, blob), a) =>
            out.position(a.toInt); out.put(blob)
          }
        case None =>
          out.position(dAt.toInt)
          d.values.foreach(v => if (d.f32) out.putFloat(v.toFloat) else out.putDouble(v))
      }
    }
    if (nDimRefs > 0) {
      val dsAddr = sorted.map(_.name).zip(ohdrAts).toMap
      out.position(gcolAt.toInt)
      out.put("GCOL".getBytes(US_ASCII)).put(1.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte)
      out.putLong(gcolSize)
      var idx = 1
      sorted.foreach(_.attrs.foreach {
        case (_, DimList(dims)) => dims.foreach { dn =>
          out.putShort(idx.toShort).putShort(0.toShort).putInt(0)
          out.putLong(8L) // object size: one object reference
          out.putLong(dsAddr(dn))
          idx += 1
        }
        case _ => ()
      })
      // free-space terminator: index 0, size covers the rest (16 bytes
      // including its own header — the spec's object-0 convention)
      out.putShort(0.toShort).putShort(0.toShort).putInt(0).putLong(16L)
    }
    out.array()
  }

  /** Row-major enumeration of all index combinations under `dims`. */
  private def combos(dims: Seq[Int]): Seq[Seq[Int]] =
    dims.foldLeft(Seq(Seq.empty[Int]))((acc, d) => acc.flatMap(pre => (0 until d).map(pre :+ _)))

  /** Gather + filter every chunk of a chunked [[WriteDs]] — (chunk offset
    * coords, on-disk blob) in row-major grid order. Edge chunks are
    * full-size with zero padding past the dataset bounds (the reader
    * skips the overhang). */
  private def chunkBlobs(d: WriteDs, latestCap: Boolean = false): Seq[(Seq[Long], Array[Byte])] = {
    val cd = d.chunk.get
    require(cd.size == d.shape.size && cd.forall(_ > 0),
      s"chunk dims $cd invalid for shape ${d.shape}")
    val elem = if (d.f32) 4 else 8
    val rank = d.shape.size
    val shape = d.shape.map(_.toInt)
    val strides = Array.fill(rank)(1)
    var k = rank - 2
    while (k >= 0) { strides(k) = strides(k + 1) * shape(k + 1); k -= 1 }
    val grid = shape.zip(cd).map { case (s, c) => (s + c - 1) / c }
    // one v1 chunk-btree leaf (the group-btree single-node argument, with
    // the istore default K=32 → 2K=64 entries); latest-format indexes
    // have no leaf bound — the extensible-array fixtures need enough
    // chunks to reach the super-block tier — so they get a sanity cap
    require(grid.product <= (if (latestCap) 4096 else 64),
      s"writer subset caps chunk count, got ${grid.product}")
    combos(grid).map { gc =>
      val offs = gc.zip(cd).map { case (gi, c) => gi.toLong * c }
      val bb = ByteBuffer.allocate(cd.product * elem).order(ByteOrder.LITTLE_ENDIAN)
      combos(cd).foreach { lc =>
        val abs = offs.zip(lc).map { case (o, l) => o + l }
        val v =
          if (abs.zip(shape).forall { case (a, s) => a < s })
            d.values(abs.zip(strides).map { case (a, st) => a * st }.sum.toInt)
          else 0.0
        if (d.f32) bb.putFloat(v.toFloat) else bb.putDouble(v)
      }
      (offs, d.filters.foldLeft(bb.array())((acc, id) => applyFilter(id, acc, elem)))
    }
  }

  /** Apply one filter on a chunk's bytes (write side — [[defilter]]'s dual). */
  private def applyFilter(id: Int, data: Array[Byte], elem: Int): Array[Byte] = id match {
    case 1 =>
      val defl = new java.util.zip.Deflater(6)
      defl.setInput(data)
      defl.finish()
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length / 2))
      val buf = new Array[Byte](8192)
      try {
        while (!defl.finished()) { val n = defl.deflate(buf); out.write(buf, 0, n) }
      } finally defl.end()
      out.toByteArray
    case 2 =>
      // leftover tail bytes (a pre-shuffle fletcher32 checksum) stay in
      // place unshuffled — the HDF5 shuffle filter's rule
      val nEl = data.length / elem
      val out = new Array[Byte](data.length)
      var j = 0
      while (j < elem) {
        var i = 0
        while (i < nEl) { out(j * nEl + i) = data(i * elem + j); i += 1 }
        j += 1
      }
      var t = nEl * elem
      while (t < data.length) { out(t) = data(t); t += 1 }
      out
    case 3 =>
      val out = ByteBuffer.allocate(data.length + 4).order(ByteOrder.LITTLE_ENDIAN)
      out.put(data).putInt(fletcher32(data, data.length).toInt)
      out.array()
    case other => throw new IllegalArgumentException(s"writer filter $other unsupported")
  }

  /** One v1 chunk-btree leaf (node type 1, level 0): alternating keys and
    * chunk addresses, plus the spec's final key (offsets = dataset shape). */
  private def chunkBtree(
      d: WriteDs, blobs: Seq[(Seq[Long], Array[Byte])], childAts: Seq[Long]): Array[Byte] = {
    val keySize = 8 + 8 * (d.shape.size + 1)
    val o = ByteBuffer.allocate(24 + blobs.size * (keySize + 8) + keySize)
      .order(ByteOrder.LITTLE_ENDIAN)
    o.put("TREE".getBytes(US_ASCII)).put(1.toByte).put(0.toByte)
    o.putShort(blobs.size.toShort).putLong(Undef).putLong(Undef)
    blobs.zip(childAts).foreach { case ((offs, blob), at) =>
      o.putInt(blob.length).putInt(0) // stored size, filter mask (none skipped)
      offs.foreach(o.putLong)
      o.putLong(0L) // element-dimension offset
      o.putLong(at)
    }
    o.putInt(0).putInt(0)
    d.shape.foreach(o.putLong)
    o.putLong(0L)
    o.array()
  }

  /** Data layout v4 class 2 (the "latest format" chunked layout):
    * flags, rank+1 chunk dims at a fixed 8-byte encoding, index type +
    * its info fields (single-chunk filtered size/mask, fixed-array page
    * bits, the extensible array's five creation parameters), then the
    * index address — [[parseLayout]]'s v4 dual. */
  private def chunkedLayoutBodyV4(idxType: Int, addr: Long, cd: Seq[Int],
      elem: Int, single: Option[(Long, Long)]): Array[Byte] = {
    val ndims = cd.size + 1
    val flags = if (single.isDefined) 0x2 else 0x0
    val extra = (if (idxType == 3) 1 else 0) + (if (idxType == 4) 5 else 0) +
      (if (idxType == 5) 6 else 0) + (if (single.isDefined) 12 else 0)
    val o = ByteBuffer.allocate(5 + ndims * 8 + 1 + extra + 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    o.put(4.toByte).put(2.toByte).put(flags.toByte).put(ndims.toByte).put(8.toByte)
    cd.foreach(c => o.putLong(c.toLong))
    o.putLong(elem.toLong)
    o.put(idxType.toByte)
    single.foreach { case (sz, mask) => o.putLong(sz).putInt(mask.toInt) }
    if (idxType == 3) o.put(10.toByte) // page bits: libhdf5's farray default
    if (idxType == 4) {
      // creation params, libhdf5's earray defaults: max nelmts bits,
      // index block elements, super-block min data pointers, data-block
      // min elements, max data-block page bits (the EAHD carries the
      // authoritative copies the reader consumes)
      o.put(32.toByte).put(4.toByte).put(4.toByte).put(16.toByte).put(10.toByte)
    }
    if (idxType == 5) {
      // node size + split/merge percents (the BTHD carries the
      // authoritative copies the reader consumes)
      o.putInt(2048); o.put(100.toByte).put(40.toByte)
    }
    o.putLong(addr)
    o.array()
  }

  /** FADB footprint for n entries at libhdf5's 2^10 page geometry:
    * non-paged = header + elements + checksum; paged (n > 1024) =
    * header + page-init bitmap + checksum, then one page per 1024
    * elements (last partial), each with its own checksum. */
  private def faDbSize(entrySize: Int, n: Int): Long = {
    val pageN = 1 << 10
    if (n <= pageN) 14L + n.toLong * entrySize + 4L
    else {
      val nPages = (n.toLong + pageN - 1) / pageN
      14L + (nPages + 7) / 8 + 4L + n.toLong * entrySize + nPages * 4L
    }
  }

  /** Fixed-array chunk index: FAHD header + its FADB data block laid out
    * contiguously, lookup3-checksummed like every latest-format
    * structure; client 1 elements carry (address, size, mask). Past
    * 2^10 entries the data block goes PAGED — a page-initialization
    * bitmap in the FADB (all-ones: the writer allocates densely) and
    * per-checksummed 1024-element pages following it — the large-cube
    * shape [[readChunked4]]'s paged path pins offline. */
  private def fixedArrayIndex(headerAt: Long, entrySize: Int, client: Int,
      blobs: Seq[(Seq[Long], Array[Byte])], childAts: Seq[Long]): Array[Byte] = {
    val n = blobs.size
    val dbAt = headerAt + 28
    val pageN = 1 << 10
    val o = ByteBuffer.allocate((28 + faDbSize(entrySize, n)).toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    o.put("FAHD".getBytes(US_ASCII)).put(0.toByte).put(client.toByte)
      .put(entrySize.toByte).put(10.toByte) // page bits
    o.putLong(n.toLong).putLong(dbAt)
    o.putInt(lookup3(o.array(), 0, 24))
    o.put("FADB".getBytes(US_ASCII)).put(0.toByte).put(client.toByte)
    o.putLong(headerAt)
    def putElement(i: Int): Unit = {
      o.putLong(childAts(i))
      if (client == 1) { o.putLong(blobs(i)._2.length.toLong); o.putInt(0) } // size, mask
    }
    if (n <= pageN) {
      (0 until n).foreach(putElement)
      o.putInt(lookup3(o.array(), 28, (14 + n * entrySize + 4) - 4))
    } else {
      val nPages = (n + pageN - 1) / pageN
      val bitmapBytes = (nPages + 7) / 8
      val bitmap = new Array[Byte](bitmapBytes)
      // MSB-first within each byte (libhdf5's H5VM_bit_set convention —
      // the reader documents why; NetCdf4Spec pins the byte value)
      (0 until nPages).foreach(p => bitmap(p / 8) = (bitmap(p / 8) | (0x80 >> (p % 8))).toByte)
      o.put(bitmap)
      o.putInt(lookup3(o.array(), 28, 14 + bitmapBytes))
      var pAt = 28 + 14 + bitmapBytes + 4
      (0 until nPages).foreach { p =>
        val cnt = math.min(pageN, n - p * pageN)
        (0 until cnt).foreach(k => putElement(p * pageN + k))
        o.putInt(lookup3(o.array(), pAt, cnt * entrySize))
        pAt += cnt * entrySize + 4
      }
    }
    o.array()
  }

  private def align8(x: Long): Long = (x + 7) / 8 * 8

  /** libhdf5's extensible-array creation defaults: max nelmts bits 32,
    * 4 index-block elements, data blocks of ≥16 elements, super blocks
    * of ≥4 data pointers (page bits 10 ride the header separately). */
  private def eaDefaults = new EaLayout(32, 4, 16, 4)

  /** The (super block, data block) pairs a dense n-chunk extensible
    * array allocates, in on-disk order, plus which of those super
    * blocks need an EASB block (u ≥ s0 — earlier ones are addressed
    * directly from the index block). */
  private def eaBlocks(n: Int): (Seq[(Int, Long)], Seq[Int]) = {
    val ea = eaDefaults
    val post = math.max(0, n - ea.idxBlkElmts).toLong
    val dblks =
      if (post == 0) Seq.empty[(Int, Long)]
      else (0 to ea.sblkOf(post - 1)).flatMap { u =>
        if (ea.startIdx(u) >= post) Nil
        else {
          val last = math.min(post - 1 - ea.startIdx(u),
            ea.ndblks(u) * ea.dblkNelmts(u) - 1)
          (0L to last / ea.dblkNelmts(u)).map(j => (u, j))
        }
      }
    (dblks, dblks.map(_._1).distinct.filter(_ >= ea.s0))
  }

  /** Pages per data block in super block u at the declared page bits —
    * 0 when the block's element count fits one page (unpaged), the
    * reader's `sbNpages` dual. */
  private def eaNpages(u: Int, pageBits: Int): Long = {
    val nel = eaDefaults.dblkNelmts(u)
    if (nel > (1L << pageBits)) nel / (1L << pageBits) else 0L
  }
  private def eaSblkSize(u: Int, pageBits: Int): Long = {
    val np = eaNpages(u, pageBits)
    val bitmap = if (np == 0) 0L else eaDefaults.ndblks(u) * ((np + 7) / 8)
    14L + 4 + bitmap + eaDefaults.ndblks(u) * 8L + 4L
  }
  private def eaDblkSize(u: Int, entrySize: Int, pageBits: Int): Long = {
    val np = eaNpages(u, pageBits)
    if (np == 0) 14L + 4 + eaDefaults.dblkNelmts(u) * entrySize + 4L
    // paged: prefix (+ its own checksum), then npages pages of
    // pageNelmts elements + a per-page checksum each
    else 14L + 4 + 4 + np * ((1L << pageBits) * entrySize + 4)
  }

  /** Total on-disk size of a dense n-chunk extensible-array index
    * (header + index block + super/data blocks, each 8-aligned). */
  private def eaSize(entrySize: Int, n: Int, pageBits: Int): Long = {
    val ea = eaDefaults
    val ib = 14L + ea.idxBlkElmts.toLong * entrySize +
      (ea.ndblkAddrs + ea.nsblkAddrs) * 8L + 4L
    val (dblks, sblks) = eaBlocks(n)
    72L + align8(ib) + sblks.map(u => align8(eaSblkSize(u, pageBits))).sum +
      dblks.map { case (u, _) => align8(eaDblkSize(u, entrySize, pageBits)) }.sum
  }

  /** Extensible-array chunk index: EAHD header, EAIB index block
    * (inline elements, direct data-block addresses, super-block
    * addresses), and the EASB/EADB blocks a dense chunk range needs,
    * laid out contiguously and lookup3-checksummed like every
    * latest-format structure; client 1 elements carry (address, size,
    * mask) — the fixed-array encode. Unused slots hold the undefined
    * address. The writer dual of [[readChunked4]]'s case 4, which is
    * what pins that decode path offline (libhdf5 emits this index for
    * an UNLIMITED-maxdim dataset — a growing forecast archive's time
    * axis). */
  private def extensibleArrayIndex(headerAt: Long, entrySize: Int, client: Int,
      blobs: Seq[(Seq[Long], Array[Byte])], childAts: Seq[Long],
      pageBits: Int = 10): Array[Byte] = {
    val ea = eaDefaults
    val n = blobs.size
    val ibSize = (14L + ea.idxBlkElmts.toLong * entrySize +
      (ea.ndblkAddrs + ea.nsblkAddrs) * 8L + 4L).toInt
    val (dblks, sblks) = eaBlocks(n)
    val ibAt = headerAt + 72
    var at = ibAt + align8(ibSize)
    val sblkAts = sblks.map { u =>
      val a = at; at += align8(eaSblkSize(u, pageBits)); u -> a
    }.toMap
    val dblkAts = dblks.map { case (u, j) =>
      val a = at; at += align8(eaDblkSize(u, entrySize, pageBits)); (u, j) -> a
    }.toMap
    val o = ByteBuffer.allocate((at - headerAt).toInt).order(ByteOrder.LITTLE_ENDIAN)
    // EAHD: creation params, stats, index block address
    o.put("EAHD".getBytes(US_ASCII)).put(0.toByte).put(client.toByte)
      .put(entrySize.toByte).put(32.toByte).put(4.toByte).put(16.toByte)
      .put(4.toByte).put(pageBits.toByte)
    o.putLong(sblks.size.toLong)
    o.putLong(sblks.map(eaSblkSize(_, pageBits)).sum)
    o.putLong(dblks.size.toLong)
    o.putLong(dblks.map { case (u, _) => eaDblkSize(u, entrySize, pageBits) }.sum)
    o.putLong(n.toLong) // max index set
    o.putLong(n.toLong) // nelements
    o.putLong(ibAt)
    o.putInt(lookup3(o.array(), 0, 68))
    def putElement(buf: ByteBuffer, i: Long): Unit =
      if (i < n) {
        buf.putLong(childAts(i.toInt))
        if (client == 1) { buf.putLong(blobs(i.toInt)._2.length.toLong); buf.putInt(0) }
      } else {
        buf.putLong(Undef)
        if (client == 1) { buf.putLong(0L); buf.putInt(0) }
      }
    // EAIB
    val ib = ByteBuffer.allocate(ibSize).order(ByteOrder.LITTLE_ENDIAN)
    ib.put("EAIB".getBytes(US_ASCII)).put(0.toByte).put(client.toByte)
    ib.putLong(headerAt)
    (0L until ea.idxBlkElmts.toLong).foreach(putElement(ib, _))
    (0 until ea.s0).foreach { u =>
      (0L until ea.ndblks(u)).foreach(j => ib.putLong(dblkAts.getOrElse((u, j), Undef)))
    }
    (ea.s0 until ea.nsblks).foreach(u => ib.putLong(sblkAts.getOrElse(u, Undef)))
    ib.putInt(lookup3(ib.array(), 0, ibSize - 4))
    o.position((ibAt - headerAt).toInt); o.put(ib.array())
    // EASBs (block offset = first element index the super block serves;
    // when this super block's data blocks page, the page-init buffer —
    // ndblks × ceil(npages/8) bytes, bits CONTINUOUS at dblk·npages +
    // page, MSB-first (H5VM convention) — sits between the offset and
    // the data block addresses; dense fixtures initialize every page of
    // every allocated data block)
    sblks.foreach { u =>
      val sz = eaSblkSize(u, pageBits).toInt
      val np = eaNpages(u, pageBits)
      val sb = ByteBuffer.allocate(sz).order(ByteOrder.LITTLE_ENDIAN)
      sb.put("EASB".getBytes(US_ASCII)).put(0.toByte).put(client.toByte)
      sb.putLong(headerAt)
      sb.putInt((ea.idxBlkElmts + ea.startIdx(u)).toInt)
      if (np > 0) {
        val bm = new Array[Byte]((ea.ndblks(u) * ((np + 7) / 8)).toInt)
        for {
          j <- 0L until ea.ndblks(u)
          if dblkAts.contains((u, j))
          p <- 0L until np
        } {
          val bit = j * np + p
          bm((bit / 8).toInt) =
            (bm((bit / 8).toInt) | (0x80 >> (bit % 8).toInt)).toByte
        }
        sb.put(bm)
      }
      (0L until ea.ndblks(u)).foreach(j => sb.putLong(dblkAts.getOrElse((u, j), Undef)))
      sb.putInt(lookup3(sb.array(), 0, sz - 4))
      o.position((sblkAts(u) - headerAt).toInt); o.put(sb.array())
    }
    // EADBs — paged blocks carry only the checksummed prefix, then each
    // page's elements + per-page checksum (H5EA__cache_dblk_page)
    dblks.foreach { case (u, j) =>
      val sz = eaDblkSize(u, entrySize, pageBits).toInt
      val np = eaNpages(u, pageBits)
      val db = ByteBuffer.allocate(sz).order(ByteOrder.LITTLE_ENDIAN)
      db.put("EADB".getBytes(US_ASCII)).put(0.toByte).put(client.toByte)
      db.putLong(headerAt)
      val start = ea.idxBlkElmts + ea.startIdx(u) + j * ea.dblkNelmts(u)
      db.putInt(start.toInt)
      if (np == 0) {
        (0L until ea.dblkNelmts(u)).foreach(k => putElement(db, start + k))
        db.putInt(lookup3(db.array(), 0, sz - 4))
      } else {
        db.putInt(lookup3(db.array(), 0, 18)) // prefix checksum
        val pageNel = 1L << pageBits
        (0L until np).foreach { p =>
          val pStart = db.position()
          (0L until pageNel).foreach(k => putElement(db, start + p * pageNel + k))
          db.putInt(lookup3(db.array(), pStart, (pageNel * entrySize).toInt))
        }
      }
      o.position((dblkAts((u, j)) - headerAt).toInt); o.put(db.array())
    }
    o.array()
  }

  private def bt2RecSize(rank: Int, filtered: Boolean): Int =
    if (filtered) 12 + 8 + rank * 8 else 8 + rank * 8 // szLen pinned at 8

  private val Bt2NodeSize = 2048 // libhdf5's v2-B-tree creation default

  /** One planned v2-B-tree node: the GLOBAL record indices it holds
    * directly plus its children (empty at depth 0). Record indices are
    * in comparator order (scaled-offset order = the blobs' row-major
    * grid order), interleaved child₀ r₀ child₁ r₁ … child_k. */
  private final case class Bt2Node(depth: Int, recs: Seq[Int], children: Seq[Bt2Node]) {
    def total: Int = recs.size + children.map(_.total).sum
  }

  /** v2-B-tree node geometry at the declared node size — the same
    * H5B2hdr arithmetic [[readChunked4]]'s case 5 derives, so writer
    * fixtures and reader agree by construction: (header-level record-
    * count field width, per-depth max records, per-depth cumulative
    * capacity, per-depth cumulative-count field width). */
  private def bt2Geom(recSize: Int, maxDepth: Int): (Int, Array[Long], Array[Long], Array[Int]) = {
    def encSize(v: Long): Int =
      (63 - java.lang.Long.numberOfLeadingZeros(math.max(1L, v))) / 8 + 1
    val maxN = new Array[Long](maxDepth + 1)
    val cum = new Array[Long](maxDepth + 1)
    val cumSize = new Array[Int](maxDepth + 1)
    maxN(0) = (Bt2NodeSize - 10) / recSize
    cum(0) = maxN(0); cumSize(0) = 0
    val maxNrecSize = encSize(maxN(0))
    var d = 1
    while (d <= maxDepth) {
      val ptr = 8 + maxNrecSize + (if (d > 1) cumSize(d - 1) else 0)
      maxN(d) = (Bt2NodeSize - (10 + ptr)) / (recSize + ptr)
      cum(d) = (maxN(d) + 1) * cum(d - 1) + maxN(d)
      cumSize(d) = encSize(cum(d))
      d += 1
    }
    (maxNrecSize, maxN, cum, cumSize)
  }

  /** Plan a minimal-depth tree over n records: depth = smallest with
    * capacity ≥ n, children per internal node = fewest whose subtrees
    * stay within the depth-below capacity (which also bounds the node's
    * own record count at maxN — k ≤ maxN+1 by the capacity recurrence). */
  private def bt2Plan(n: Int, recSize: Int): (Bt2Node, Int, Array[Int]) = {
    val maxDepth = 4 // 2048-byte nodes at depth 4 address millions of chunks
    val (maxNrecSize, _, cum, cumSize) = bt2Geom(recSize, maxDepth)
    val depth = (0 to maxDepth).find(d => cum(d) >= n).getOrElse(
      throw new IllegalArgumentException(
        s"writer subset caps the v2-B-tree at depth $maxDepth, $n records exceed it"))
    def build(lo: Int, hi: Int, d: Int): Bt2Node =
      if (d == 0) Bt2Node(0, lo until hi, Nil)
      else {
        val nn = hi - lo
        val cap = cum(d - 1)
        val k = (((nn + 1).toLong + cap) / (cap + 1)).toInt // ceil((nn+1)/(cap+1))
        val totChild = nn - (k - 1)
        val base = totChild / k; val rem = totChild % k
        var at = lo
        val children = Seq.newBuilder[Bt2Node]
        val recs = Seq.newBuilder[Int]
        (0 until k).foreach { i =>
          val cnt = base + (if (i < rem) 1 else 0)
          children += build(at, at + cnt, d - 1)
          at += cnt
          if (i < k - 1) { recs += at; at += 1 }
        }
        Bt2Node(d, recs.result(), children.result())
      }
    (build(0, n, depth), maxNrecSize, cumSize)
  }

  private def bt2NodeBytes(nd: Bt2Node, recSize: Int, maxNrecSize: Int,
      cumSize: Array[Int]): Long =
    if (nd.depth == 0) 6L + nd.recs.size.toLong * recSize + 4
    else {
      val ptr = 8 + maxNrecSize + (if (nd.depth > 1) cumSize(nd.depth - 1) else 0)
      6L + nd.recs.size.toLong * recSize + (nd.recs.size + 1).toLong * ptr + 4
    }

  private def bt2Nodes(root: Bt2Node): Seq[Bt2Node] = {
    def go(nd: Bt2Node): Seq[Bt2Node] = nd +: nd.children.flatMap(go)
    go(root)
  }

  /** BTHD (38) + every planned BTIN/BTLF node, each 8-aligned. */
  private def bt2Size(rank: Int, filtered: Boolean, n: Int): Long = {
    val recSize = bt2RecSize(rank, filtered)
    val (root, maxNrecSize, cumSize) = bt2Plan(n, recSize)
    align8(38L) + bt2Nodes(root)
      .map(nd => align8(bt2NodeBytes(nd, recSize, maxNrecSize, cumSize))).sum
  }

  /** v2 B-tree chunk index — BTHD header plus a SPEC-CONFORMANT tree at
    * the declared 2048-byte node size: records beyond one leaf's
    * capacity split across BTLF leaves under BTIN internal nodes whose
    * records interleave with child pointers (type 10 unfiltered:
    * address + per-rank scaled offsets; type 11 filtered: + 8-byte
    * chunk size + mask) — the several-unlimited-maxdims index
    * [[readChunked4]]'s case 5 pins offline, now including the
    * multi-level form a >~46-chunk archive grows (the old single-leaf
    * writer crammed every record into one leaf past the declared node
    * capacity — ADVICE r17). */
  private def btree2Index(headerAt: Long, rank: Int, filtered: Boolean,
      chunkDims: Seq[Int], blobs: Seq[(Seq[Long], Array[Byte])],
      childAts: Seq[Long]): Array[Byte] = {
    val n = blobs.size
    val recSize = bt2RecSize(rank, filtered)
    val recType = if (filtered) 11 else 10
    val (root, maxNrecSize, cumSize) = bt2Plan(n, recSize)
    val nodes = bt2Nodes(root)
    // pre-order addresses, header first
    val nodeAt = scala.collection.mutable.Map.empty[Bt2Node, Long]
    var at = headerAt + align8(38L)
    nodes.foreach { nd =>
      nodeAt(nd) = at
      at += align8(bt2NodeBytes(nd, recSize, maxNrecSize, cumSize))
    }
    val o = ByteBuffer.allocate((at - headerAt).toInt).order(ByteOrder.LITTLE_ENDIAN)
    o.put("BTHD".getBytes(US_ASCII)).put(0.toByte).put(recType.toByte)
    o.putInt(Bt2NodeSize)
    o.putShort(recSize.toShort).putShort(root.depth.toShort)
    o.put(100.toByte).put(40.toByte) // split/merge percents (defaults)
    o.putLong(nodeAt(root))
    o.putShort(root.recs.size.toShort)
    o.putLong(n.toLong)
    o.putInt(lookup3(o.array(), 0, 34))
    def putUvar(v: Long, bytes: Int): Unit = {
      var x = v; var i = 0
      while (i < bytes) { o.put((x & 0xff).toByte); x >>>= 8; i += 1 }
    }
    def putRec(i: Int): Unit = {
      val (offs, blob) = blobs(i)
      o.putLong(childAts(i))
      if (filtered) { o.putLong(blob.length.toLong); o.putInt(0) } // size, mask
      offs.zip(chunkDims).foreach { case (off, cd) => o.putLong(off / cd) }
    }
    nodes.foreach { nd =>
      val nAt = (nodeAt(nd) - headerAt).toInt
      o.position(nAt)
      if (nd.depth == 0) {
        o.put("BTLF".getBytes(US_ASCII)).put(0.toByte).put(recType.toByte)
        nd.recs.foreach(putRec)
      } else {
        o.put("BTIN".getBytes(US_ASCII)).put(0.toByte).put(recType.toByte)
        nd.recs.foreach(putRec)
        nd.children.foreach { ch =>
          o.putLong(nodeAt(ch))
          putUvar(ch.recs.size.toLong, maxNrecSize)
          if (nd.depth > 1) putUvar(ch.total.toLong, cumSize(nd.depth - 1))
        }
      }
      val sz = bt2NodeBytes(nd, recSize, maxNrecSize, cumSize).toInt
      o.putInt(lookup3(o.array(), nAt, sz - 4))
    }
    o.array()
  }

  /** Data layout v3 class 2 (chunked): dimensionality (rank+1), chunk
    * btree address, u32 chunk dims with the element size as the last. */
  private def chunkedLayoutBody(btreeAddr: Long, cd: Seq[Int], elem: Int): Array[Byte] = {
    val o = ByteBuffer.allocate(11 + 4 * (cd.size + 1)).order(ByteOrder.LITTLE_ENDIAN)
    o.put(3.toByte).put(2.toByte).put((cd.size + 1).toByte).putLong(btreeAddr)
    cd.foreach(o.putInt)
    o.putInt(elem)
    o.array()
  }

  /** Filter pipeline message v1: deflate carries its level, shuffle its
    * element size — the client data libnetcdf records. */
  private def filterPipelineBody(filters: Seq[Int], elem: Int): Array[Byte] = {
    val parts = filters.map { id =>
      val cdata: Seq[Int] = id match {
        case 1 => Seq(6) // deflate level
        case 2 => Seq(elem) // shuffle element size
        case 3 => Nil // fletcher32 carries no client data
        case other => throw new IllegalArgumentException(s"writer filter $other unsupported")
      }
      val padded = if (cdata.size % 2 == 1) cdata :+ 0 else cdata
      val o = ByteBuffer.allocate(8 + padded.size * 4).order(ByteOrder.LITTLE_ENDIAN)
      o.putShort(id.toShort).putShort(0.toShort) // name length 0 (id < 256)
      o.putShort(0.toShort).putShort(cdata.size.toShort) // flags, n client data
      padded.foreach(o.putInt)
      o.array()
    }
    val o = ByteBuffer.allocate(8 + parts.map(_.length).sum).order(ByteOrder.LITTLE_ENDIAN)
    o.put(1.toByte).put(filters.size.toByte)
    o.position(8) // 6 reserved bytes
    parts.foreach(o.put)
    o.array()
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

  /** Version-2 object header: OHDR prefix (flags declare a 4-byte
    * chunk-0 size, no times/ordering), 1-byte message types, unpadded
    * bodies, trailing lookup3 checksum — [[readHeaderV2]]'s dual. */
  private def ohdrV2(msgs: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val size = msgs.map(4 + _._2.length).sum
    val o = ByteBuffer.allocate(10 + size + 4).order(ByteOrder.LITTLE_ENDIAN)
    o.put("OHDR".getBytes(US_ASCII)).put(2.toByte).put(0x02.toByte)
    o.putInt(size)
    msgs.foreach { case (t, body) =>
      // the v2 size field is 2 bytes; .toShort on a larger body would
      // silently wrap and emit a header whose message stream disagrees
      // with the declared chunk-0 size
      require(body.length <= 0xFFFF,
        s"OHDR v2 message type $t body ${body.length} exceeds 2-byte size field")
      o.put(t.toByte).putShort(body.length.toShort).put(0.toByte).put(body)
    }
    o.putInt(lookup3(o.array(), 0, 10 + size))
    o.array()
  }

  /** Hard-link message body (type 0x0006, v1): flags 0 → 1-byte name
    * length, no creation order/charset, link type hard. */
  private def linkBody(name: String, addr: Long): Array[Byte] = {
    val nb = name.getBytes(US_ASCII)
    require(nb.length >= 1 && nb.length <= 255,
      s"link name length ${nb.length} out of range")
    ByteBuffer.allocate(3 + nb.length + 8).order(ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).put(0.toByte).put(nb.length.toByte).put(nb).putLong(addr)
      .array()
  }

  private def ohdrBytes(msgs: Seq[Array[Byte]]): Array[Byte] = {
    val size = msgs.map(_.length).sum
    val o = ByteBuffer.allocate(16 + size).order(ByteOrder.LITTLE_ENDIAN)
    o.put(1.toByte).put(0.toByte).putShort(msgs.size.toShort)
    o.putInt(1).putInt(size).putInt(0) // refcount, header size, align pad
    msgs.foreach(o.put)
    o.array()
  }

  private def dataspaceBody(shape: Seq[Long],
      maxDims: Option[Seq[Long]] = None): Array[Byte] = {
    maxDims.foreach(m => require(m.size == shape.size,
      s"maxDims rank ${m.size} != shape rank ${shape.size}"))
    val o = ByteBuffer.allocate(8 + shape.size * 8 * (if (maxDims.isDefined) 2 else 1))
      .order(ByteOrder.LITTLE_ENDIAN)
    o.put(1.toByte).put(shape.size.toByte)
      .put((if (maxDims.isDefined) 1 else 0).toByte)
    o.put(0.toByte).putInt(0)
    shape.foreach(o.putLong)
    maxDims.foreach(_.foreach(o.putLong))
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
    value match {
      case DimListEnc(gheapAt, firstIdx, n) =>
        // vlen(sequence) of object references, one element per axis;
        // each 16-byte element is (length=1, collection addr, index)
        val dt = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
        dt.put(0x19.toByte).put(0.toByte).put(0.toByte).put(0.toByte) // vlen sequence
        dt.putInt(16)
        dt.put(0x17.toByte).put(0.toByte).put(0.toByte).put(0.toByte) // object ref base
        dt.putInt(8)
        val ds = dataspaceBody(Seq(n.toLong))
        val data = ByteBuffer.allocate(n * 16).order(ByteOrder.LITTLE_ENDIAN)
        (0 until n).foreach { i =>
          data.putInt(1).putLong(gheapAt).putInt(firstIdx + i)
        }
        val o = ByteBuffer.allocate(
          8 + pad8(nb.length) + pad8(16) + pad8(ds.length) + n * 16)
          .order(ByteOrder.LITTLE_ENDIAN)
        o.put(1.toByte).put(0.toByte)
        o.putShort(nb.length.toShort).putShort(16.toShort).putShort(ds.length.toShort)
        o.put(nb).position(o.position() + pad8(nb.length) - nb.length)
        o.put(dt.array())
        o.put(ds).position(o.position() + pad8(ds.length) - ds.length)
        o.put(data.array())
        return o.array()
      case DimList(_) => throw new IllegalArgumentException(
        "DimList must be resolved to DimListEnc by write()")
      case _ => ()
    }
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
    * the same argument): float64 data laid out (time, y, x), double
    * coordinates, CF epoch-seconds time units, nulls as NaN so
    * encode∘decode is the identity on defined cells. `chunked = true`
    * writes the data variable the way libnetcdf writes cube-sized
    * variables — one (1, ny, nx) time-slab chunk per step,
    * shuffle+deflate filtered — instead of one contiguous blob; both
    * forms decode identically (NetCdf4Spec pins the parity). */
  def encodeCube(df: DataFrame, parameter: String,
                 chunked: Boolean = false, latest: Boolean = false): Array[Byte] = {
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
    val (chunk, filters) =
      if (chunked) {
        // (k, ny, nx) chunks with k sized so the chunk grid stays within
        // the writer's single-leaf chunk b-tree (<= 64 chunks) at ANY
        // cube length — one-chunk-per-step threw past 64 time steps
        val k = (times.length + 63) / 64
        (Some(Seq(k, ys.length, xs.length)), Seq(2, 1))
      } else (None, Nil)
    write(Seq(
      WriteDs("time", Seq(times.length.toLong), times.map(_ / 1000.0),
        attrs = Seq("units" -> "seconds since 1970-01-01 00:00:00")),
      WriteDs("y", Seq(ys.length.toLong), ys),
      WriteDs("x", Seq(xs.length.toLong), xs),
      WriteDs(parameter,
        Seq(times.length.toLong, ys.length.toLong, xs.length.toLong), grid,
        chunk = chunk, filters = filters)), latest)
  }
}
