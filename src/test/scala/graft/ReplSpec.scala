package graft

import java.io.{ByteArrayOutputStream, PrintStream}

import graft.core.Ingest

/** End-to-end REPL parity with the reference's golden specs
  * (`/root/reference/spec/main_spec.rb`): each test scripts stdin lines
  * exactly like `run_script` and asserts on the captured stdout lines,
  * with the reference's verbatim prompt, replies, and error strings. */
class ReplSpec extends SparkSpecBase {

  private def dbDir(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_io/repl_$name"

  private def rm(dir: String): Unit = {
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del)
      f.delete(); ()
    }
    del(new java.io.File(dir))
  }

  /** The reference spec's run_script: feed lines, capture stdout, split. */
  private def runScript(db: String, commands: Seq[String],
      sfDir: Option[String] = None): Seq[String] = {
    val bos = new ByteArrayOutputStream()
    Repl.loop(spark, db, sfDir, commands.iterator,
      new PrintStream(bos, true, "UTF-8"))
    // prompts have no trailing newline, so splitting yields the same
    // "db > <reply>" line shapes the reference spec matches against
    bos.toString("UTF-8").split("\n", -1).toSeq
  }

  test("inserts and retrieves a row (main_spec.rb:21-33)") {
    val db = dbDir("insert_select"); rm(db)
    val out = runScript(db, Seq(
      "insert 1 user1 person1@example.com",
      "select",
      ".exit"))
    assert(out == Seq(
      "db > Executed.",
      "db > (1, user1, person1@example.com)",
      "Executed.",
      "db > "))
  }

  test("allows max-length strings; rejects over-length (main_spec.rb:44-74)") {
    val db = dbDir("maxlen"); rm(db)
    val maxU = "a" * 32
    val maxE = "a" * 255
    val ok = runScript(db, Seq(s"insert 1 $maxU $maxE", "select", ".exit"))
    assert(ok == Seq(
      "db > Executed.",
      s"db > (1, $maxU, $maxE)",
      "Executed.",
      "db > "))
    rm(db)
    val tooLong = runScript(db,
      Seq(s"insert 1 ${"a" * 33} ${"a" * 256}", "select", ".exit"))
    assert(tooLong == Seq(
      "db > String is too long.",
      "db > Executed.",
      "db > "))
  }

  test("negative id / syntax / unknown keyword error strings (db.cpp:576-585)") {
    val db = dbDir("errors"); rm(db)
    val out = runScript(db, Seq(
      "insert -1 test test@test.com",
      "insert 1 only_two",
      "insert notanumber u e",
      "gibberish statement",
      ".exit"))
    assert(out == Seq(
      "db > ID must be positive.",
      "db > Syntax error. Could not parse statement",
      "db > Syntax error. Could not parse statement",
      "db > Unrecognized keyword at start of 'gibberish statement'",
      "db > "))
  }

  test("unrecognized meta-command reply (db.cpp:581-583)") {
    val db = dbDir("meta_err"); rm(db)
    val out = runScript(db, Seq(".notathing", ".exit"))
    assert(out == Seq(
      "db > Unrecognized command '.notathing'",
      "db > "))
  }

  test("1401-insert script: the capacity divergence, pinned (main_spec.rb:35-42)") {
    // The reference's single-page table rejects insert #1401 with
    // 'db > Error: Table full' (LEAF_NODE_MAX_CELLS = 13 per page ×
    // hard-coded page budget — db.cpp:64-66). That gate is a consequence
    // of its fixed 4 KB pager, not a semantic: this engine's declared
    // divergence (SURVEY §2.3, ConstraintSpec pins it) is that the SAME
    // script runs to completion — every insert replies 'Executed.' and
    // the full row count survives the close. This test drives the
    // reference script VERBATIM and pins our side of the divergence.
    val db = dbDir("table_full"); rm(db)
    val script = (1 to 1401).map(i =>
      s"insert $i user$i person$i@example.com") :+ ".exit"
    val out = runScript(db, script)
    assert(out.length == 1402, "one reply line per insert + final prompt")
    assert(out.take(1401).forall(_ == "db > Executed."),
      "no capacity gate: every insert succeeds (declared divergence)")
    assert(out.last == "db > ")
    val reread = runScript(db, Seq("select", ".exit"))
    assert(reread.length == 1403, "1401 rows + Executed. + prompt")
    assert(reread.head == "db > (1, user1, person1@example.com)")
    assert(reread(1400) == "(1401, user1401, person1401@example.com)")
  }

  test("keeps data after closing connection (main_spec.rb:93-109)") {
    val db = dbDir("persist"); rm(db)
    val first = runScript(db, Seq("insert 1 user1 person1@example.com", ".exit"))
    assert(first == Seq("db > Executed.", "db > "))
    val second = runScript(db, Seq("select", ".exit"))
    assert(second == Seq(
      "db > (1, user1, person1@example.com)",
      "Executed.",
      "db > "))
  }

  test(".constants prints the layout-governing config (main_spec.rb:111-128)") {
    val db = dbDir("constants"); rm(db)
    val out = runScript(db, Seq(".constants", ".exit"))
    assert(out.head == "db > Constants:")
    assert(out.exists(_.startsWith("spark.sql.shuffle.partitions: ")))
    assert(out.exists(_.startsWith("spark.sql.files.maxPartitionBytes: ")))
    assert(out.last == "db > ")
  }

  test(".btree prints insertion-ordered keys (main_spec.rb:130-149)") {
    val db = dbDir("btree"); rm(db)
    val out = runScript(db, Seq(
      "insert 3 user3 person3@example.com",
      "insert 1 user1 person1@example.com",
      "insert 2 user2 person2@example.com",
      ".btree",
      ".exit"))
    assert(out == Seq(
      "db > Executed.",
      "db > Executed.",
      "db > Executed.",
      "db > Tree:",
      "leaf (size 3)",
      "  - 0 : 3",
      "  - 1 : 1",
      "  - 2 : 2",
      "db > "))
  }

  test("SQL statements run over the users view and harness tables") {
    val db = dbDir("sql"); rm(db)
    val out = runScript(db, Seq(
      "insert 2 user2 b@example.com",
      "insert 1 user1 a@example.com",
      "SELECT id, username FROM users ORDER BY id",
      "SELECT COUNT(*) FROM region",
      ".exit"), sfDir = Some(sf0001))
    assert(out == Seq(
      "db > Executed.",
      "db > Executed.",
      "db > (1, user1)",
      "(2, user2)",
      "Executed.",
      "db > (5)",
      "Executed.",
      "db > "))
  }

  test("runtime SQL failures don't kill the session or lose inserts (ADVICE r9)") {
    val db = dbDir("rt_err"); rm(db)
    val out = runScript(db, Seq(
      "insert 1 user1 a@example.com",
      // parses fine, throws at execution: the session must survive it
      "SELECT raise_error('boom')",
      "select",
      ".exit"))
    assert(out.head == "db > Executed.")
    assert(out.exists(l => l.startsWith("db > Error: ")),
      s"runtime failure must print an Error reply, got: $out")
    assert(out.exists(_.endsWith("(1, user1, a@example.com)")),
      "the session (and its rows) must survive a runtime SQL failure")
    assert(out.last == "db > ")
    val reread = runScript(db, Seq("select", ".exit"))
    assert(reread.head == "db > (1, user1, a@example.com)",
      "rows inserted before the failure must persist through .exit")
  }

  test(".layout prints the physical row-group key map") {
    val db = dbDir("layout"); rm(db)
    val out = runScript(db, Seq(
      "insert 7 u e@x.com",
      "insert 9 v f@x.com",
      ".layout",
      ".exit"))
    assert(out.head == "db > Executed.")
    val layoutIdx = out.indexOf("db > Layout:")
    assert(layoutIdx >= 0)
    assert(out(layoutIdx + 1).contains("keys=[7, 9]"))
    assert(out(layoutIdx + 1).contains("rows=2"))
  }

  test("scalar parseLine agrees with the columnar parseStatements surface") {
    val s = spark
    import s.implicits._
    val lines = Seq(
      "insert 1 u e@x.com", "insert -5 u e", "insert 1 toolong" + "a" * 40,
      "insert 1 u " + "b" * 256, "insert", "insert 2", "select everything",
      "", "  insert   3   spaced   out@x.com  ", "insert x y z",
      "INSERT 1 u e")
    val columnar = Ingest.parseStatements(lines.toDF("line"), "line")
      .collect().map(r => Option(r.getString(3)))
    lines.zip(columnar).foreach { case (line, colErr) =>
      val scalarErr = Ingest.parseLine(line).left.toOption
      assert(scalarErr == colErr,
        s"parseLine vs parseStatements diverge on '$line': " +
          s"$scalarErr vs $colErr")
    }
  }
}
