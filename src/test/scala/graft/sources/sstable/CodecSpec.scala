package graft.sources.sstable

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Codec round-trip + split-planning unit tests (SURVEY.md §5.2-2/-3;
  * fixture cases from FIXTURES.md §B). No Spark involved. */
class CodecSpec extends AnyFunSuite {

  private def tmpData(prefix: String): String = {
    val dir = Files.createTempDirectory("sstable-codec").toFile
    dir.deleteOnExit()
    new java.io.File(dir, s"$prefix-Data.db").getPath
  }

  private def write(path: String, rows: Seq[SSTableRow], compress: Boolean,
                    chunkLength: Int = 256, summaryInterval: Int = 4): Unit = {
    val w = new SSTableWriter(path, compress, chunkLength, summaryInterval)
    try rows.foreach(w.append) finally w.close()
  }

  private def sortedRows(rows: Seq[SSTableRow]): Seq[SSTableRow] =
    rows.sortWith((a, b) => SSTableFiles.compareKeys(a.key, b.key) < 0)

  private def assertRowsEqual(got: Seq[SSTableRow], want: Seq[SSTableRow]): Unit = {
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.key.sameElements(w.key), "key mismatch")
      assert(g.tombstone == w.tombstone, "row tombstone mismatch")
      assert(g.columns.length == w.columns.length)
      g.columns.zip(w.columns).foreach {
        case (Column.Normal(n1, v1, t1), Column.Normal(n2, v2, t2)) =>
          assert(n1.sameElements(n2) && v1.sameElements(v2) && t1 == t2)
        case (Column.Deleted(n1, t1), Column.Deleted(n2, t2)) =>
          assert(n1.sameElements(n2) && t1 == t2)
        case (Column.Expiring(n1, v1, ttl1, e1, t1), Column.Expiring(n2, v2, ttl2, e2, t2)) =>
          assert(n1.sameElements(n2) && v1.sameElements(v2) &&
            ttl1 == ttl2 && e1 == e2 && t1 == t2)
        case (g0, w0) => fail(s"state mismatch: $g0 vs $w0")
      }
    }
  }

  // FIXTURES.md B2 "states": all three column states incl. all-DELETED row
  // and past/future expirations.
  private val statesRows = sortedRows(Seq(
    SSTableRow("alpha".getBytes, Seq(
      Column.Normal("c1".getBytes, "v1".getBytes, 1000L),
      Column.Expiring("c2".getBytes, "v2".getBytes, 60L, 1700000000000L, 2000L))),
    SSTableRow("beta".getBytes, Seq(
      Column.Deleted("c1".getBytes, 3000L),
      Column.Deleted("c9".getBytes, 3500L))),
    SSTableRow("gamma".getBytes, Seq(
      Column.Expiring("c3".getBytes, Array[Byte](), 1L, 1000L, 4000L),
      Column.Normal("c4".getBytes, Array[Byte](9, 8, 7), 5000L)))))

  test("row-level tombstones round-trip (incl. pure-tombstone zero-column row)") {
    val rows = sortedRows(Seq(
      SSTableRow("live".getBytes, Seq(Column.Normal("c".getBytes, "v".getBytes, 10L))),
      // wholesale-deleted row: deletion info set, zero columns (body = 16 bytes)
      SSTableRow("gone".getBytes, Nil, Some(RowTombstone(1700000000, 5000L))),
      // deleted-then-rewritten: tombstone AND newer columns coexist on disk
      SSTableRow("mixed".getBytes, Seq(Column.Normal("c".getBytes, "new".getBytes, 9000L)),
        Some(RowTombstone(1690000000, 8000L)))))
    for (compress <- Seq(false, true)) {
      val p = tmpData(s"rowtomb-$compress")
      write(p, rows, compress)
      assertRowsEqual(new SSTableReader(p).rows().toSeq, rows)
    }
    // the LIVE sentinel PAIR is unrepresentable as a tombstone
    val p2 = tmpData("rowtomb-reserved")
    val w = new SSTableWriter(p2, compress = false)
    try intercept[IllegalArgumentException] {
      w.append(SSTableRow("x".getBytes, Nil,
        Some(RowTombstone(Int.MaxValue, Long.MinValue))))
    } finally w.close()
    // ...but the pathological half-LIVE pair (mfda=MIN, ldt!=MAX) is a
    // representable shadows-nothing tombstone and round-trips byte-exactly
    // instead of silently losing its ldt (ADVICE r3)
    val p3 = tmpData("rowtomb-halflive")
    val odd = Seq(SSTableRow("x".getBytes, Nil, Some(RowTombstone(0, Long.MinValue))))
    write(p3, odd, compress = false)
    assertRowsEqual(new SSTableReader(p3).rows().toSeq, odd)
    assert(!odd.head.tombstone.get.shadows(0L))
  }

  test("round-trip uncompressed (states fixture)") {
    val p = tmpData("states-plain")
    write(p, statesRows, compress = false)
    val r = new SSTableReader(p)
    assertRowsEqual(r.rows().toSeq, statesRows)
  }

  test("round-trip compressed (states fixture)") {
    val p = tmpData("states-comp")
    write(p, statesRows, compress = true)
    val r = new SSTableReader(p)
    assert(r.compressed)
    assertRowsEqual(r.rows().toSeq, statesRows)
  }

  // FIXTURES.md B5 "binary-keys": 0x00, high bytes, invalid UTF-8, empty.
  test("round-trip deflate-compressed; header names DeflateCompressor") {
    val p = tmpData("states-deflate")
    val w = new SSTableWriter(p, compress = true, chunkLength = 256,
      summaryInterval = 4, algorithm = "deflate")
    try statesRows.foreach(w.append) finally w.close()
    val r = new SSTableReader(p)
    assert(r.compressed)
    assert(r.compressionInfo.get.algorithm == CompressionInfo.DeflateAlgorithm)
    assertRowsEqual(r.rows().toSeq, statesRows)
    // a snappy reader decoding deflate chunks would fail the magic/adler —
    // the algorithm string is what routes the codec; bad names fail loudly
    assertThrows[IllegalArgumentException](
      new SSTableWriter(tmpData("bad-algo"), algorithm = "lz77"))
  }

  test("binary keys survive round-trip and sort unsigned") {
    val rows = sortedRows(Seq(
      SSTableRow(Array[Byte](), Seq(Column.Normal("n".getBytes, "empty-key".getBytes, 1L))),
      SSTableRow(Array[Byte](0, 0, 1), Seq(Column.Normal(Array[Byte](0), Array[Byte](0xff.toByte), 2L))),
      SSTableRow(Array[Byte](0xff.toByte, 0xfe.toByte), Seq(Column.Deleted(Array[Byte](0x80.toByte), 3L))),
      SSTableRow(Array[Byte](0x7f), Seq(Column.Normal("x".getBytes, Array[Byte](), 4L)))))
    val p = tmpData("binkeys")
    write(p, rows, compress = true)
    val got = new SSTableReader(p).rows().toSeq
    assertRowsEqual(got, rows)
    // unsigned order: empty < 00 00 01 < 7f < ff fe
    assert(got.map(_.key.toSeq) == rows.map(_.key.toSeq))
  }

  test("writer rejects out-of-order keys") {
    val p = tmpData("unsorted")
    val w = new SSTableWriter(p)
    w.append(SSTableRow("b".getBytes, Nil))
    intercept[IllegalArgumentException] {
      w.append(SSTableRow("a".getBytes, Nil))
    }
    w.close()
  }

  // FIXTURES.md B4 "compressed-multichunk": ≥8 chunks, rows crossing chunk
  // and split boundaries; every row read exactly once across splits.
  test("multichunk: splits cover every row exactly once") {
    val rows = sortedRows((0 until 200).map { i =>
      SSTableRow(f"key$i%05d".getBytes,
        Seq(Column.Normal("col".getBytes, Array.fill(37)(i.toByte), i.toLong)))
    })
    val p = tmpData("multichunk")
    write(p, rows, compress = true, chunkLength = 256, summaryInterval = 4)
    val r = new SSTableReader(p)
    assert(r.compressionInfo.get.chunkCount >= 8, s"want >=8 chunks, got ${r.compressionInfo.get.chunkCount}")

    val splits = r.planSplits(targetBytes = 1000)
    assert(splits.length > 3, s"want multiple splits, got ${splits.length}")
    // coverage: contiguous, starts at header, ends at dataLength
    assert(splits.head.start == DataFile.HeaderLen)
    assert(splits.last.end == r.dataLength)
    splits.sliding(2).foreach { case Vector(a, b) => assert(a.end == b.start); case _ => }

    val gathered = splits.flatMap(s => r.rows(s.start, s.end).toSeq)
    assertRowsEqual(gathered, rows)
  }

  // Regression (ADVICE r5): a huge legal targetBytes used to truncate the
  // sampling stride to <=0 after Long→Int conversion, spinning the planning
  // loop forever; it must saturate at one whole-file split and terminate.
  test("planSplits terminates and yields one split for huge targetBytes") {
    val rows = sortedRows((0 until 200).map { i =>
      SSTableRow(f"big$i%05d".getBytes,
        Seq(Column.Normal("col".getBytes, Array.fill(37)(i.toByte), i.toLong)))
    })
    val p = tmpData("hugetarget")
    write(p, rows, compress = true, chunkLength = 256, summaryInterval = 4)
    val r = new SSTableReader(p)
    for (target <- Seq(Long.MaxValue, Long.MaxValue / 2, Int.MaxValue.toLong * 3)) {
      val splits = r.planSplits(target)
      assert(splits.length == 1, s"target=$target want 1 split, got ${splits.length}")
      assert(splits.head.start == DataFile.HeaderLen)
      assert(splits.head.end == r.dataLength)
      val gathered = splits.flatMap(s => r.rows(s.start, s.end).toSeq)
      assertRowsEqual(gathered, rows)
    }
  }

  test("key-range pruning is sound and effective") {
    val rows = sortedRows((0 until 500).map { i =>
      SSTableRow(f"k$i%05d".getBytes,
        Seq(Column.Normal("c".getBytes, s"v$i".getBytes, i.toLong)))
    })
    val p = tmpData("prune")
    write(p, rows, compress = true, chunkLength = 512, summaryInterval = 8)
    val r = new SSTableReader(p)
    val splits = r.planSplits(2000)
    val lo = "k00100".getBytes
    val hi = "k00150".getBytes
    val pruned = r.pruneSplits(splits, Some(lo), Some(hi))
    assert(pruned.length < splits.length, "pruning should drop splits")
    val got = pruned.flatMap(s => r.rows(s.start, s.end).toSeq)
      .filter(row => SSTableFiles.compareKeys(row.key, lo) >= 0 &&
        SSTableFiles.compareKeys(row.key, hi) <= 0)
    assert(got.length == 51) // k00100..k00150 inclusive
  }

  test("pruning keeps splits whose bound equals the filter key (duplicate-key runs)") {
    // Duplicate keys are allowed by the writer and can straddle a split
    // boundary: a split may then contain keys EQUAL to its lastKeyBound.
    // A key = 'dup' filter must not lose any of those rows to pruning.
    val rows =
      (0 until 5).map(i => SSTableRow("aaa".getBytes,
        Seq(Column.Normal(s"a$i".getBytes, "v".getBytes, i.toLong)))) ++
      (0 until 40).map(i => SSTableRow("dup".getBytes,
        Seq(Column.Normal(f"c$i%03d".getBytes, Array.fill(29)(i.toByte), i.toLong)))) ++
      (0 until 5).map(i => SSTableRow("zzz".getBytes,
        Seq(Column.Normal(s"z$i".getBytes, "v".getBytes, i.toLong))))
    val p = tmpData("dupkeys")
    write(p, rows, compress = false, summaryInterval = 4)
    val r = new SSTableReader(p)
    val splits = r.planSplits(targetBytes = 200)
    assert(splits.length > 2, s"need multiple splits, got ${splits.length}")
    // boundaries land inside the 'dup' run
    assert(splits.exists(_.lastKeyBound.exists(_.sameElements("dup".getBytes))))
    val dup = "dup".getBytes
    val kept = r.pruneSplits(splits, Some(dup), Some(dup))
    val got = kept.flatMap(s => r.rows(s.start, s.end).toSeq)
      .filter(_.key.sameElements(dup))
    assert(got.length == 40, s"pruning dropped duplicate-key rows: ${got.length}/40")
  }

  test("point read: bloom → summary search → bounded index window → one row") {
    val p = tmpData("pointread")
    val rows = sortedRows((0 until 500).map(i =>
      SSTableRow(f"row$i%05d".getBytes,
        Seq(Column.Normal("c".getBytes, s"v$i".getBytes, i.toLong)))))
    write(p, rows, compress = true)
    val r = new SSTableReader(p)
    // hits across summary windows (interval 4 → 125 windows)
    for (i <- Seq(0, 1, 127, 128, 129, 250, 498, 499)) {
      val got = r.get(f"row$i%05d".getBytes)
      assert(got.isDefined, s"row$i missing")
      assert(new String(got.get.columns.head.asInstanceOf[Column.Normal].value) == s"v$i")
    }
    // misses: before-first, between keys (bloom may pass; index must say no), after-last
    assert(r.get("aaa".getBytes).isEmpty)
    assert(r.get("row00250x".getBytes).isEmpty)
    assert(r.get("zzz".getBytes).isEmpty)
  }

  test("range tombstones round-trip (flag 0x10: min name, max name, deletion time)") {
    val rows = sortedRows(Seq(
      SSTableRow("row1".getBytes, Seq(
        Column.Normal("a".getBytes, "va".getBytes, 10L),
        // slice delete of [b, d] recorded at ts 50
        Column.RangeTombstone("b".getBytes, "d".getBytes, 1700000000, 50L),
        Column.Normal("e".getBytes, "ve".getBytes, 20L))),
      SSTableRow("row2".getBytes, Seq(
        Column.RangeTombstone(Array[Byte](0), Array[Byte](-1, -1), 1, 99L)))))
    for (compress <- Seq(false, true)) {
      val p = tmpData(s"rangetomb-$compress")
      write(p, rows, compress)
      assertRowsEqual2(new SSTableReader(p).rows().toSeq, rows)
    }
    // GC (live) view of the point read: the range itself is dropped like
    // a cell tombstone; un-shadowed cells remain
    val p = tmpData("rangetomb-gc")
    write(p, rows, compress = false)
    val live = SSTableReader.get(p, "row1".getBytes, gcTombstones = true).get
    assert(live.columns.map(c => new String(c.name)) == Seq("a", "e"))
    assert(SSTableReader.get(p, "row2".getBytes, gcTombstones = true).isEmpty,
      "a pure-range row has nothing live")

    // shadows(): inclusive bounds, ts <= mfda, unsigned name order
    val rt = Column.RangeTombstone("b".getBytes, "d".getBytes, 0, 50L)
    assert(rt.shadows("b".getBytes, 50L) && rt.shadows("d".getBytes, 1L))
    assert(!rt.shadows("b".getBytes, 51L)) // newer than the delete
    assert(!rt.shadows("a".getBytes, 1L) && !rt.shadows("e".getBytes, 1L))
  }

  test("counter columns round-trip raw (flags 0x04/0x08); merge paths refuse them") {
    val ctx = Array[Byte](0, 1, 2, 3, 4, 5, 6, 7, 8, 9) // opaque replication context
    val rows = sortedRows(Seq(
      SSTableRow("cnt1".getBytes, Seq(
        Column.Counter("hits".getBytes, ctx, 100L, 5000L),
        Column.Normal("plain".getBytes, "v".getBytes, 10L))),
      SSTableRow("cnt2".getBytes, Seq(
        Column.CounterUpdate("hits".getBytes, Array[Byte](0, 0, 0, 0, 0, 0, 0, 3), 6000L)))))
    for (compress <- Seq(false, true)) {
      val p = tmpData(s"counter-$compress")
      write(p, rows, compress)
      val got = new SSTableReader(p).rows().toSeq
      assert(got.length == 2)
      got.zip(rows).foreach { case (g, w) =>
        g.columns.zip(w.columns).foreach {
          case (Column.Counter(n1, v1, d1, t1), Column.Counter(n2, v2, d2, t2)) =>
            assert(n1.sameElements(n2) && v1.sameElements(v2) && d1 == d2 && t1 == t2)
          case (Column.CounterUpdate(n1, v1, t1), Column.CounterUpdate(n2, v2, t2)) =>
            assert(n1.sameElements(n2) && v1.sameElements(v2) && t1 == t2)
          case (Column.Normal(n1, v1, t1), Column.Normal(n2, v2, t2)) =>
            assert(n1.sameElements(n2) && v1.sameElements(v2) && t1 == t2)
          case (g0, w0) => fail(s"state mismatch: $g0 vs $w0")
        }
      }
    }
    // the Scala merge twin refuses counters with a clear message (the
    // DataFrame path's refusal is pinned in SSTableOpsSpec)
    val p = tmpData("counter-merge")
    write(p, rows, compress = false)
    val e = intercept[IllegalArgumentException](
      SSTableReader.get(p, "cnt1".getBytes))
    assert(e.getMessage.contains("no LWW merge semantics"))
  }

  /** assertRowsEqual extended with the RangeTombstone case. */
  private def assertRowsEqual2(got: Seq[SSTableRow], want: Seq[SSTableRow]): Unit = {
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.key.sameElements(w.key))
      g.columns.zip(w.columns).foreach {
        case (Column.RangeTombstone(n1, m1, l1, t1), Column.RangeTombstone(n2, m2, l2, t2)) =>
          assert(n1.sameElements(n2) && m1.sameElements(m2) && l1 == l2 && t1 == t2)
        case (Column.Normal(n1, v1, t1), Column.Normal(n2, v2, t2)) =>
          assert(n1.sameElements(n2) && v1.sameElements(v2) && t1 == t2)
        case (g0, w0) => fail(s"state mismatch: $g0 vs $w0")
      }
    }
  }

  test("getAll returns every duplicate-key row, incl. runs straddling summary windows") {
    val p = tmpData("dups")
    // summaryInterval=4 (write() default): a 6-row duplicate run is
    // guaranteed to straddle a window boundary somewhere
    val dup = (0 until 6).map(i =>
      SSTableRow("dup".getBytes, Seq(Column.Normal(s"c$i".getBytes, s"v$i".getBytes, i.toLong))))
    val rows = sortedRows(Seq(
      SSTableRow("aaa".getBytes, Seq(Column.Normal("c".getBytes, "a".getBytes, 1L))),
      SSTableRow("zzz".getBytes, Seq(Column.Normal("c".getBytes, "z".getBytes, 1L)))) ++ dup)
    write(p, rows, compress = true)
    val r = new SSTableReader(p)
    val got = r.getAll("dup".getBytes)
    assert(got.length == 6, s"want all 6 duplicates, got ${got.length}")
    assert(got.map(x => new String(x.columns.head.name)) == (0 until 6).map(s"c" + _))
    assert(r.get("dup".getBytes).get.columns.head.name.sameElements("c0".getBytes),
      "get returns the FIRST duplicate in file order")
    assert(r.getAll("aaa".getBytes).length == 1 && r.getAll("nope".getBytes).isEmpty)
    // directory-level get merges the duplicates like compactRows would
    val merged = SSTableReader.get(p, "dup".getBytes).get
    assert(merged.columns.length == 6, "all six distinct column names survive the merge")
  }

  test("multi-generation point read reconciles LWW + row tombstone across files") {
    val dir = Files.createTempDirectory("multigen").toString
    def gen(name: String, rows: Seq[SSTableRow]): Unit =
      write(s"$dir/$name-Data.db", sortedRows(rows), compress = true)

    // gen1: apple{c1@10, c2@20}, banana{c1@15}, cherry{c1@5}
    gen("gen1", Seq(
      SSTableRow("apple".getBytes, Seq(
        Column.Normal("c1".getBytes, "old".getBytes, 10L),
        Column.Normal("c2".getBytes, "keep".getBytes, 20L))),
      SSTableRow("banana".getBytes, Seq(Column.Normal("c1".getBytes, "b".getBytes, 15L))),
      SSTableRow("cherry".getBytes, Seq(Column.Normal("c1".getBytes, "ch".getBytes, 5L)))))
    // gen2: apple.c1 rewritten @30 + cell tombstone c3@25; cherry wholesale-
    // deleted at mfda=50 (pure-tombstone row)
    gen("gen2", Seq(
      SSTableRow("apple".getBytes, Seq(
        Column.Normal("c1".getBytes, "new".getBytes, 30L),
        Column.Deleted("c3".getBytes, 25L))),
      SSTableRow("cherry".getBytes, Nil, Some(RowTombstone(1700000000, 50L)))))

    // apple: merged across generations, c1 LWW'd to gen2's version
    val apple = SSTableReader.get(dir, "apple".getBytes).get
    assert(apple.tombstone.isEmpty)
    assert(apple.columns.map(c => new String(c.name)) == Seq("c1", "c2", "c3"))
    assert(new String(apple.columns.head.asInstanceOf[Column.Normal].value) == "new")
    // GC view: the c3 cell tombstone drops, live cells remain
    assert(SSTableReader.get(dir, "apple".getBytes, gcTombstones = true)
      .get.columns.map(c => new String(c.name)) == Seq("c1", "c2"))

    // banana: single-generation hit passes through
    assert(SSTableReader.get(dir, "banana".getBytes).get.columns.length == 1)

    // cherry: storage view = pure-tombstone row (older column shadowed);
    // GC view = None — the key reads as deleted across generations
    val cherry = SSTableReader.get(dir, "cherry".getBytes).get
    assert(cherry.columns.isEmpty && cherry.tombstone.contains(RowTombstone(1700000000, 50L)))
    assert(SSTableReader.get(dir, "cherry".getBytes, gcTombstones = true).isEmpty)

    // a newer write above the tombstone resurrects the key in GC view
    gen("gen3", Seq(
      SSTableRow("cherry".getBytes, Seq(Column.Normal("c1".getBytes, "back".getBytes, 60L)))))
    val back = SSTableReader.get(dir, "cherry".getBytes, gcTombstones = true).get
    assert(new String(back.columns.head.asInstanceOf[Column.Normal].value) == "back")

    // absent key: every generation's bloom/index says no
    assert(SSTableReader.get(dir, "durian".getBytes).isEmpty)
  }

  test("corruption fails loudly, not silently") {
    val p = tmpData("corrupt")
    write(p, statesRows, compress = true)
    // flip bytes in the middle of the compressed data file
    val raf = new java.io.RandomAccessFile(p, "rw")
    raf.seek(raf.length() / 2)
    raf.writeInt(0xdeadbeef)
    raf.close()
    val r = new SSTableReader(p)
    intercept[Exception] { r.rows().toSeq } // checksum or snappy failure
  }

  test("property: random rows round-trip compressed and uncompressed") {
    val rnd = new scala.util.Random(42)
    def bytes(): Array[Byte] = {
      val a = new Array[Byte](rnd.nextInt(41))
      rnd.nextBytes(a)
      a
    }
    def column(): Column = rnd.nextInt(3) match {
      case 0 => Column.Normal(bytes(), bytes(), rnd.nextLong(1L << 60))
      case 1 => Column.Deleted(bytes(), rnd.nextLong(1L << 60))
      // expiresMillis second-aligned and within u32-seconds — the format's
      // domain (localExpirationTime is a u32 seconds epoch)
      case _ => Column.Expiring(bytes(), bytes(), rnd.nextLong(1L << 30),
        rnd.nextInt(Int.MaxValue).toLong * 1000L, rnd.nextLong(1L << 60))
    }
    for (trial <- 0 until 30) {
      val compress = trial % 2 == 0
      val rows = sortedRows(Seq.fill(rnd.nextInt(31))(
        SSTableRow(bytes(), Seq.fill(rnd.nextInt(6))(column()))))
      val p = tmpData("prop")
      val w = new SSTableWriter(p, compress, chunkLength = 128,
        summaryInterval = 3, enforceSorted = false)
      try rows.foreach(w.append) finally w.close()
      val got = new SSTableReader(p).rows().toSeq
      // the writer normalizes cells to comparator order (the format
      // invariant); stable, so equal random names keep input order
      assertRowsEqual(got, rows.map(r => r.copy(columns =
        r.columns.sortWith((a, b) => SSTableFiles.compareKeys(a.name, b.name) < 0))))
    }
  }

  test("writer normalizes cells to comparator order (the format invariant)") {
    val p = tmpData("colsort")
    write(p, Seq(SSTableRow("k".getBytes, Seq(
      Column.Normal("zz".getBytes, "3".getBytes, 3L),
      Column.Deleted("aa".getBytes, 1L),
      Column.Normal("mm".getBytes, "2".getBytes, 2L)))), compress = false)
    val got = new SSTableReader(p).rows().toSeq.head
    assert(got.columns.map(c => new String(c.name)) == Seq("aa", "mm", "zz"))
  }

  test("column slice decodes only in-range bodies; out-of-range value bytes are never read") {
    // one wide row: 200 cells of 1 KiB each, names c000..c199. The slice
    // [c050, c059] must (a) return exactly those cells and (b) read far
    // fewer bytes than a full decode — pre-slice values are length-skipped
    // and the first post-slice name seeks to the row end. Uncompressed, so
    // a counting SeekableInput sees the decoder's true byte appetite.
    val p = tmpData("slice")
    val big = Array.fill[Byte](1024)(7)
    write(p, Seq(SSTableRow("wide".getBytes,
      (0 until 200).map(i => Column.Normal(f"c$i%03d".getBytes, big, i.toLong)))),
      compress = false)
    final class CountingInput(inner: SeekableInput) extends SeekableInput {
      var bytesRead = 0L
      def position: Long = inner.position
      def seek(pos: Long): Unit = inner.seek(pos)
      def length: Long = inner.length
      def read(buf: Array[Byte], off: Int, len: Int): Int = {
        val n = inner.read(buf, off, len)
        if (n > 0) bytesRead += n
        n
      }
      def close(): Unit = inner.close()
    }
    def scan(lo: Option[(Array[Byte], Boolean)],
             hi: Option[(Array[Byte], Boolean)],
             sortedNames: Boolean = true): (Seq[SSTableRow], Long) = {
      val cin = new CountingInput(new FileSeekableInput(p))
      val r = new DataReader(cin, Long.MaxValue, lo, hi, sortedNames)
      val rows = r.toSeq
      r.close()
      (rows, cin.bytesRead)
    }
    val (full, fullBytes) = scan(None, None)
    assert(full.head.columns.length == 200)
    val (sliced, slicedBytes) = scan(
      Some(("c050".getBytes, true)), Some(("c059".getBytes, true)))
    assert(sliced.head.columns.map(c => new String(c.name)) ==
      (50 to 59).map(i => f"c$i%03d"))
    // full decode reads ~200 KiB of values; the slice needs 10 KiB of
    // values + headers up to the exit — well under a quarter of full
    assert(slicedBytes < fullBytes / 4,
      s"slice read $slicedBytes of $fullBytes bytes — skip not effective")

    // exclusive bounds drop the endpoints
    val (excl, _) = scan(
      Some(("c050".getBytes, false)), Some(("c059".getBytes, false)))
    assert(excl.head.columns.map(c => new String(c.name)) ==
      (51 to 58).map(i => f"c$i%03d"))

    // WITHOUT the sorted-names guarantee the early seek is off: same
    // results, still body-skipping (headers cost a little extra)
    val (safe, safeBytes) = scan(
      Some(("c050".getBytes, true)), Some(("c059".getBytes, true)),
      sortedNames = false)
    assert(safe.head.columns.map(c => new String(c.name)) ==
      (50 to 59).map(i => f"c$i%03d"))
    assert(safeBytes < fullBytes / 4,
      s"safe walk read $safeBytes of $fullBytes bytes — body skip not effective")
  }

  test("sliced reads stay correct on unsorted-name generations (pre-v3 layout, ADVICE r6)") {
    // Hand-encode a row whose names are OUT of comparator order — the
    // shape earlier releases produced (the writer then encoded caller
    // column order; it normalizes today). The seek-to-row-end fast path
    // would early-exit at "cz" and silently drop the in-range "ab"/"ba"
    // behind it; without the v3 sorted-names guarantee the reader must
    // take the per-name walk and return every in-range cell.
    val p = tmpData("unsorted-names")
    val out = new java.io.DataOutputStream(new java.io.FileOutputStream(p))
    try DataFile.writeRow(out, SSTableRow("k".getBytes, Seq(
      Column.Normal("aa".getBytes, "1".getBytes, 1L),
      Column.Normal("cz".getBytes, "4".getBytes, 4L), // above the slice, early
      Column.Normal("ab".getBytes, "2".getBytes, 2L), // in range, after it
      Column.Normal("ba".getBytes, "3".getBytes, 3L))))
    finally out.close()
    def slice(sortedNames: Boolean): Seq[String] = {
      val r = new DataReader(new FileSeekableInput(p), Long.MaxValue,
        Some(("ab".getBytes, true)), Some(("bb".getBytes, true)), sortedNames)
      val rows = r.toSeq
      r.close()
      rows.head.columns.map(c => new String(c.name))
    }
    assert(slice(sortedNames = false) == Seq("ab", "ba"),
      "safe walk must surface in-range cells hiding behind an out-of-order name")
    // and the reader's file-level entry point takes the safe path when no
    // statistics sidecar vouches for sort order
    val viaReader = new SSTableReader(p).rows(0L, Long.MaxValue,
      Some(("ab".getBytes, true)), Some(("bb".getBytes, true)))
    assert(viaReader.toSeq.head.columns.map(c => new String(c.name)) ==
      Seq("ab", "ba"))
  }
}
