package graft

import java.io.PrintStream

import org.apache.spark.sql.SparkSession

import graft.core.{Ingest, Meta}

/** Interactive statement REPL — the analogue of the reference's main loop
  * (`/root/reference/db.cpp:538-601`): prompt, read a line, dispatch to a
  * meta-command (leading '.') or a statement, print the reply, repeat.
  *
  * Parity surface (`spec/main_spec.rb` shapes, verbatim strings):
  *   - prompt `"db > "`, `.exit` closes the db (flush, `db.cpp:519-521`);
  *   - `insert <id> <username> <email>` via [[Ingest.parseLine]] — the
  *     reference's exact validation order and error strings
  *     (`db.cpp:576-585`): `Syntax error. Could not parse statement`,
  *     `Unrecognized keyword at start of '<input>'`,
  *     `String is too long.`, `ID must be positive.`; `Executed.` on
  *     success;
  *   - bare `select` prints every stored row as `(id, username, email)`
  *     (`db.cpp:444-446`) then `Executed.`;
  *   - `.constants` prints `Constants:` + the layout-governing session
  *     configuration ([[Meta.constants]] — the `db.cpp:459-467` analogue);
  *   - `.btree` prints `Tree:` + `leaf (size N)` + `  - <idx> : <id>` in
  *     insertion order (`db.cpp:448-457` prints the root leaf's cells in
  *     exactly this format — here the "leaf" is the users table);
  *   - unknown meta-commands reply `Unrecognized command '<input>'`
  *     (`db.cpp:581-583` switch arm at `main`).
  *
  * Superset surface (the Spark engine behind the same prompt):
  *   - any other line is executed as a `spark.sql` statement over the
  *     registered harness views and the live `users` view — the
  *     SqlCatalog front door made interactive. A line Spark cannot parse
  *     replies with the reference's unrecognized-keyword string.
  *   - `.schema` lists the queryable views, `.layout` prints the parquet
  *     row-group key map of the persisted db ([[Meta.layout]], the
  *     physical dual of `.btree`).
  *
  * Persistence mirrors `db_open`/`db_close` (`db.cpp:546,519`): rows load
  * from the db path at open and flush back at `.exit` — the
  * keeps-data-after-closing spec (`spec/main_spec.rb:93-109`).
  *
  * Scale note: the REPL is a driver-side interactive shell by contract —
  * its `users` table is REPL state (like the reference's single page),
  * while arbitrary SQL it accepts runs as normal distributed plans.
  */
object Repl {

  /** One REPL session over explicit input/output streams — the testable
    * core (`ReplSpec` drives it with scripted stdin exactly like the
    * reference's `run_script`). */
  def loop(spark: SparkSession, dbPath: String, sfDir: Option[String],
      in: Iterator[String], out: PrintStream): Unit = {
    import spark.implicits._
    sfDir.foreach(d => SqlCatalog.registerViews(spark, d))

    // db_open: load the persisted table (insertion order preserved via idx)
    val buf = scala.collection.mutable.ArrayBuffer[Ingest.User]()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(dbPath)))
      buf ++= spark.read.parquet(dbPath).orderBy("idx")
        .select("id", "username", "email").as[Ingest.User].collect()

    def refreshView(): Unit =
      spark.createDataset(buf.toSeq).toDF("id", "username", "email")
        .createOrReplaceTempView("users")
    refreshView()

    def flush(): Unit =
      spark.createDataset(buf.toSeq.zipWithIndex.map { case (u, i) =>
        (i.toLong, u.id, u.username, u.email)
      }).toDF("idx", "id", "username", "email")
        .coalesce(1).write.mode("overwrite").parquet(dbPath)

    def renderRow(vs: Seq[Any]): String =
      vs.map(v => if (v == null) "NULL" else v.toString)
        .mkString("(", ", ", ")")

    var done = false
    // flush-on-any-exit: .exit and end-of-input flush inline below, but a
    // fatal error escaping the dispatch (meta-command I/O, OOM) must still
    // persist this session's inserts — overwrite-mode flush is idempotent,
    // so the extra call on the normal path is harmless (ADVICE r9)
    try while (!done) {
      out.print("db > ")
      if (!in.hasNext) { flush(); done = true }
      else {
        val input = in.next()
        if (input.startsWith(".")) input match {
          case ".exit" =>
            flush(); done = true
          case ".constants" =>
            out.println("Constants:")
            Meta.constants(spark).collect().foreach { r =>
              out.println(s"${r.getString(0)}: ${r.getString(1)}")
            }
          case ".btree" =>
            out.println("Tree:")
            out.println(s"leaf (size ${buf.size})")
            buf.zipWithIndex.foreach { case (u, i) =>
              out.println(s"  - $i : ${u.id}")
            }
          case ".schema" =>
            out.println(s"users(id BIGINT, username STRING, email STRING)")
            spark.catalog.listTables().collect()
              .map(_.name).filterNot(_ == "users").sorted
              .foreach(t => out.println(t))
          case ".layout" =>
            flush() // the physical map reflects the flushed file
            out.println("Layout:")
            Meta.layout(spark, dbPath, "id").collect().foreach { r =>
              out.println(s"  ${r.getString(0)} rg=${r.getInt(1)} " +
                s"keys=[${r.getLong(2)}, ${r.getLong(3)}] rows=${r.getLong(4)}")
            }
          case _ =>
            out.println(s"Unrecognized command '$input'")
        } else if (input.trim == "select") {
          buf.foreach(u => out.println(renderRow(Seq(u.id, u.username, u.email))))
          out.println("Executed.")
        } else if (input.startsWith("insert")) {
          Ingest.parseLine(input) match {
            case Right(u) =>
              buf += u; refreshView(); out.println("Executed.")
            case Left(err) => out.println(err)
          }
        } else {
          try {
            val rows = spark.sql(input)
            rows.collect().foreach(r => out.println(renderRow(r.toSeq)))
            out.println("Executed.")
          } catch {
            case _: org.apache.spark.sql.AnalysisException |
                 _: org.apache.spark.sql.catalyst.parser.ParseException =>
              out.println(s"Unrecognized keyword at start of '$input'")
            // a statement that PARSES but fails at execution time (bad
            // file path in a read, ANSI cast overflow, ...) must not kill
            // the session — the reference's loop survives every bad input,
            // and an escaping exception here would skip the .exit flush
            // and lose the rows inserted this session (ADVICE r9)
            case scala.util.control.NonFatal(e) =>
              out.println(s"Error: ${e.getMessage}")
          }
        }
      }
    } finally scala.util.Try(flush()).failed.foreach { e =>
      // a session that died abnormally AND whose safety-net flush failed
      // must say so — silently dropping the failure would let the user
      // believe their inserts persisted when they did not (ADVICE r10)
      out.println(s"Error: flush failed: ${e.getMessage}")
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      // verbatim db.cpp:542
      println("Must supply a database filename.")
      sys.exit(1)
    }
    val dbPath = args(0)
    val sfDir = args.lift(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // shared session recipe (VERDICT r10 #5) — same engine config as
    // Bench/Verify; ERROR level keeps the interactive prompt clean
    val spark = GraftSession.local(cpus, logLevel = "ERROR")
    try loop(spark, dbPath, sfDir, scala.io.Source.stdin.getLines(), Console.out)
    finally spark.stop()
  }
}
