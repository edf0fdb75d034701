package graft.operators

import graft.damds.DamdsIO
import graft.sources.PointSources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle rows for the text source/sink family (previously spec-only):
  * formula-defined data goes out through the real sinks and back in
  * through the real scans, and DuckDB recomputes the formula — so the
  * writer formatting, the line parsing, the arity check and the
  * whole-file matrix assembly are all under the correctness gate.
  * Double→text→double is exact (Java shortest-roundtrip formatting on
  * the write side, exact parse on the scan side).
  */
object SourceQueries {

  private val nPts = 500

  /** Per-key scratch dirs, memoized for the JVM lifetime (ADVICE r13:
    * p04 wrote a fresh corpus-sized CSV copy per invocation and never
    * deleted it, so repeated bench/correctness runs steadily leaked
    * disk). Every sink here writes with Overwrite, so reruns replace
    * the previous copy in place; a shutdown hook removes the trees
    * (deleteOnExit cannot remove non-empty directories). */
  private val scratchDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def scratch(key: String): String =
    scratchDirs.computeIfAbsent(key, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-scratch")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(p.toFile)
      }
      p.toString
    })

  // ---- p01: K1 text sink → S8 line source → S5 point scan ----
  private def p01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch("p01") // fixture is formula-defined: one slot
    val pts = s.range(nPts).select(
      (($"id" * 37 % 1000) / 1000.0).as("x"),
      (($"id" * 11 % 1000) / 1000.0).as("y"))
    PointSources.writeText(pts, out)
    PointSources.points(s, out, d = 2, strict = true)
      .select($"v"(0).as("x"), $"v"(1).as("y"))
  }
  private val p01Sql =
    s"""SELECT (r.range * 37 % 1000) / 1000.0 AS x,
       |  (r.range * 11 % 1000) / 1000.0 AS y
       |FROM range($nPts) r""".stripMargin

  // ---- p02: K2 text matrix writer → S4 whole-file matrix scan ----
  private val mRows = 64
  private val mCols = 16

  private def p02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val f = java.nio.file.Files.createTempFile("graft-matrix", ".txt")
    f.toFile.deleteOnExit()
    graft.mm.MatrixIO.writePointsText(f.toString,
      Array.tabulate(mRows * mCols)(k =>
        ((k / mCols) * 37 + (k % mCols) * 11) % 1000 / 1000.0), mCols)
    PointSources.wholeFileMatrix(s, f.toString, mRows, mCols)
      .flatMap { b =>
        for (i <- 0 until b.blockRows; j <- 0 until b.matrixCols)
          yield ((b.start + i).toLong, j.toLong, b.data(i * b.matrixCols + j))
      }
      .toDF("row", "col", "v")
  }
  private val p02Sql =
    s"""SELECT r.range AS row, c.range AS col,
       |  CAST((r.range * 37 + c.range * 11) % 1000 AS DOUBLE) / 1000.0 AS v
       |FROM range($mRows) r CROSS JOIN range($mCols) c""".stripMargin

  // ---- p03: S7/S10/J2 side-read join through the driver gate ----
  // Formula-defined binary short dist + weight files go out through the
  // real binary writer and come back through `DamdsIO.loadSideRead` —
  // the reference's filReadJoin: ONE scan whose tasks side-read their
  // matching weight row range directly (zero shuffle, no
  // co-partitioning needed; the scale path when both matrices live on
  // a shared filesystem). Cells are emitted fixed-point-decoded and
  // DuckDB recomputes the generating formula — so the split math, the
  // binary round-trip, the side-read pairing, and the N7 decode are
  // all under the gate.
  private val sdN = 64

  // The fixture is formula-defined (independent of the sf dir), so it
  // is written once per JVM and registered for deletion on exit —
  // bench runs each query twice plus verify, and the un-memoized form
  // left a fresh temp dir per invocation.
  private lazy val sideReadFixture: (String, String) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sideread")
    val dist = tmp.resolve("dist.bin")
    val wgt = tmp.resolve("weight.bin")
    graft.mm.MatrixIO.writeShortMatrix(dist.toString,
      Array.tabulate(sdN * sdN)(k =>
        (((k / sdN) * 31 + (k % sdN) * 17) % 32768).toShort), bigEndian = true)
    graft.mm.MatrixIO.writeShortMatrix(wgt.toString,
      Array.tabulate(sdN * sdN)(k =>
        (((k / sdN) * 13 + (k % sdN) * 7) % 32768).toShort), bigEndian = true)
    Seq(dist, wgt, tmp).foreach(p => p.toFile.deleteOnExit())
    (dist.toString, wgt.toString)
  }

  private def p03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (dist, wgt) = sideReadFixture
    DamdsIO.loadSideRead(s, dist, Some(wgt), sdN, numSplits = 8)
      .flatMap { b =>
        for (i <- 0 until b.blockRows; j <- 0 until b.n) yield
          ((b.start + i).toLong, j.toLong,
            b.dist(i * b.n + j) * (1.0 / 32767),
            b.weight(i * b.n + j) * (1.0 / 32767))
      }
      .toDF("row", "col", "d", "w")
  }
  private val p03Sql =
    s"""SELECT r.range AS row, c.range AS col,
       |  ((r.range * 31 + c.range * 17) % 32768) * (1.0 / 32767) AS d,
       |  ((r.range * 13 + c.range * 7) % 32768) * (1.0 / 32767) AS w
       |FROM range($sdN) r CROSS JOIN range($sdN) c""".stripMargin

  // ---- p04: CSV sink → scan round-trip (quoting/escape/multiline) ----
  // The interchange format every ingest pipeline still meets. The
  // corpus text is CSV-benign at every SF (no quotes, commas, or
  // newlines — probed), so the round-trip is made non-trivial by
  // UNIONING three hostile rows — embedded quotes, commas, and a real
  // newline — before writing: the writer must quote+escape them, the
  // reader must reassemble the multi-line record, and every byte must
  // survive (md5 compared, corpus rows included). The reader takes an
  // EXPLICIT schema (no inference pass — the two-scan trap) and
  // multiLine only because the fixture proves the embedded-newline
  // path; bulk CSV ingest without embedded newlines keeps the
  // splittable default.
  private val csvHostile = Seq(
    (1000001L, "a,b \"quoted\" text"),
    (1000002L, "line1\nline2"),
    (1000003L, " leading and trailing "))

  private def p04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch(s"p04:$dir") // corpus-sized copy: keyed by dir
    val docs = graft.Tables(s, dir, "documents")
      .select($"doc_id", $"text")
      .unionAll(csvHostile.toDF("doc_id", "text"))
    docs.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .option("quoteAll", "true")
      // the WRITER trims by default — a silent byte-mangler this
      // round-trip exists to catch
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(out)
    s.read
      .schema("doc_id LONG, text STRING")
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true")
      .csv(out)
      .select($"doc_id", md5($"text".cast("binary")).as("text_md5"))
  }
  private val p04Sql = {
    val lits = csvHostile.map { case (id, t) =>
      val sqlLit = t.replace("'", "''").replace("\n", "' || chr(10) || '")
      s"SELECT CAST($id AS BIGINT) AS doc_id, md5('$sqlLit') AS text_md5"
    }.mkString("\nUNION ALL\n")
    s"""SELECT doc_id, md5(text) AS text_md5 FROM documents
       |UNION ALL
       |$lits""".stripMargin
  }

  // ---- p05: JSON-lines sink → scan round-trip (escape/unicode) ----
  // The other interchange format every ingest pipeline meets (web
  // crawls and LLM corpora ship as JSONL). The hostile rows force the
  // writer's escape paths — embedded quote, backslash, control chars
  // (newline/tab land as \n/\t inside the string, keeping the file
  // line-delimited and SPLITTABLE — the property that makes JSONL the
  // 100 TB interchange format where p04's multiLine CSV is not), and
  // non-ASCII incl. a surrogate-pair emoji, so the UTF-8 encode/decode
  // path is proven byte-exact (md5-compared). The reader takes an
  // EXPLICIT schema — no inference pass (the two-scan trap on a
  // 100 TB lake).
  private val jsonHostile = Seq(
    (2000001L, "quote \" backslash \\ slash / end"),
    (2000002L, "line1\nline2\ttabbed"),
    (2000003L, "café naïve – emoji 😀"),
    (2000004L, " leading and trailing "))

  private def p05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = scratch(s"p05:$dir") // corpus-sized copy: keyed by dir
    val docs = graft.Tables(s, dir, "documents")
      .select($"doc_id", $"text")
      .unionAll(jsonHostile.toDF("doc_id", "text"))
    docs.write.mode("overwrite").json(out)
    s.read
      .schema("doc_id LONG, text STRING")
      .json(out)
      .select($"doc_id", md5($"text".cast("binary")).as("text_md5"))
  }
  private val p05Sql = {
    val lits = jsonHostile.map { case (id, t) =>
      val sqlLit = t.replace("'", "''")
        .replace("\n", "' || chr(10) || '")
        .replace("\t", "' || chr(9) || '")
      s"SELECT CAST($id AS BIGINT) AS doc_id, md5('$sqlLit') AS text_md5"
    }.mkString("\nUNION ALL\n")
    s"""SELECT doc_id, md5(text) AS text_md5 FROM documents
       |UNION ALL
       |$lits""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("p04_csv_roundtrip", p04, Some(p04Sql)),
    Q("p05_jsonl_roundtrip", p05, Some(p05Sql)),
    Q("p01_points_text_roundtrip", p01, Some(p01Sql)),
    Q("p02_wholefile_matrix_roundtrip", p02, Some(p02Sql)),
    Q("p03_sideread_join_roundtrip", p03, Some(p03Sql)))
}
