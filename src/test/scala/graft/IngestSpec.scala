package graft

import org.apache.spark.sql.functions._

import graft.core.Ingest

/** The reference's statement parser (`prepareInsert`,
  * `/root/reference/db.cpp:392-426`) as a relational op: exact error
  * strings, boundary acceptance, and the typed Dataset[User] surface. */
class IngestSpec extends SparkSpecBase {

  private def parse(lines: String*) = {
    val s = spark
    import s.implicits._
    Ingest.parseStatements(lines.toDF("stmt"), "stmt")
      .collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        Option(r.getString(3))))
  }

  test("happy path accepts and extracts fields") {
    val s = spark
    import s.implicits._
    val users = Ingest.parseAccepted(spark,
      Seq("insert 1 user1 person1@example.com").toDF("stmt"), "stmt")
      .collect()
    assert(users.toSeq == Seq(Ingest.User(1L, "user1", "person1@example.com")))
  }

  test("reference error strings (verbatim, db.cpp:576-585)") {
    val out = parse(
      "update 9 x y",                             // unrecognized keyword
      "insert 1 bob",                             // arity
      "insert abc bob bob@x.com",                 // non-numeric id
      "insert -1 test test@test.com",             // db.cpp:411-414
      s"insert 2 ${"a" * 33} ok@x.com",           // db.cpp:416-419
      s"insert 3 ok ${"a" * 256}",
      s"insert 4 ${"a" * 32} ${"a" * 255}")       // boundary accept
    // the reference interpolates the offending input (db.cpp:579) and
    // prints the syntax error with NO trailing period (db.cpp:576)
    assert(out(0)._2.contains("Unrecognized keyword at start of 'update 9 x y'"))
    assert(out(1)._2.contains("Syntax error. Could not parse statement"))
    assert(out(2)._2.contains("Syntax error. Could not parse statement"))
    assert(out(3)._2.contains("ID must be positive."))
    assert(out(4)._2.contains("String is too long."))
    assert(out(5)._2.contains("String is too long."))
    assert(out(6)._2.isEmpty) // exactly-at-boundary accepted
  }
}
