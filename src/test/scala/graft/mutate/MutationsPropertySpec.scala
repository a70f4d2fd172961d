package graft.mutate

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the statement parser: the quote/paren-aware
  * splitter must never mis-tokenize on adversarial string contents
  * (keywords, separators, parens inside literals), and INSERT parsing
  * must round-trip arbitrary tuple shapes. */
class MutationsPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** SQL string literal with embedded quotes doubled. */
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  private val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(6, Gen.alphaNumChar)
  } yield (h :: t).mkString

  // payloads chosen to attack the parser: separators, keywords, parens,
  // quotes — all inside string literals
  private val nasty: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr.map(_.take(18)),
    Gen.oneOf("a,b", "x WHERE y", "VALUES (1)", "(((", ")))", "it's",
      "O'Brien, PhD (ret.)", "SET a = b", ";", "don''t"))

  test("property: splitTopLevel never splits inside literals or parens") {
    check(Prop.forAll(Gen.listOfN(4, nasty)) { parts =>
      val joined = parts.map(sqlLit).mkString(",")
      val out = Mutations.splitTopLevel(joined, ',')
      out.length == parts.length &&
        out.zip(parts).forall { case (got, p) => got == sqlLit(p) }
    })
  }

  test("property: INSERT round-trips arbitrary literal tuples") {
    val tuple = Gen.listOfN(3, nasty).map(vs => vs.map(sqlLit))
    check(Prop.forAll(ident, Gen.nonEmptyListOf(tuple).map(_.take(5))) { (table, tuples) =>
      val sql = s"INSERT INTO $table VALUES ${tuples.map(_.mkString("(", ", ", ")")).mkString(", ")}"
      Mutations.intercept(sql) match {
        case Some(Mutations.Insert(t, None, parsed)) =>
          t == table && parsed.map(_.map(_.trim)) == tuples.map(_.map(_.trim))
        case other => false
      }
    })
  }

  test("property: UPDATE keeps WHERE inside SET string literals attached to SET") {
    check(Prop.forAll(ident, ident, nasty) { (table, col, payload) =>
      val sql = s"UPDATE $table SET $col = ${sqlLit(payload + " WHERE x")} WHERE $col = 1"
      Mutations.intercept(sql) match {
        case Some(Mutations.Update(t, Seq((c, rhs)), Some(where))) =>
          t == table && c == col &&
            rhs == sqlLit(payload + " WHERE x") && where == s"$col = 1"
        case other => false
      }
    })
  }

  test("property: DELETE with adversarial WHERE literal keeps full predicate") {
    check(Prop.forAll(ident, nasty) { (table, payload) =>
      val sql = s"DELETE FROM $table WHERE note = ${sqlLit(payload)}"
      Mutations.intercept(sql) match {
        case Some(Mutations.Delete(t, Some(where))) =>
          t == table && where == s"note = ${sqlLit(payload)}"
        case other => false
      }
    })
  }

  test("backtick and [bracket] identifier spans are atomic in the scanners") {
    // an apostrophe / comma / semicolon / paren inside either quoting
    // form must not open a literal, split the list, or shift depth
    assert(Mutations.splitTopLevel("`we're, ok`,b", ',') == Seq("`we're, ok`", "b"))
    assert(Mutations.splitTopLevel("[we're, ok],b", ',') == Seq("[we're, ok]", "b"))
    assert(Mutations.splitTopLevel("`a``b,c`,d", ',') == Seq("`a``b,c`", "d"))
    assert(Mutations.splitTopLevel("f(arr[i], 2),g", ',') == Seq("f(arr[i], 2)", "g"))
    // a WHERE inside a backtick/bracket span is not a top-level keyword
    assert(Mutations.indexOfTopLevelWord("`x WHERE y` WHERE z", "WHERE") == 12)
    assert(Mutations.indexOfTopLevelWord("[x WHERE y] WHERE z", "WHERE") == 12)
    // UPDATE SET scanning survives a bracket span with an apostrophe
    Mutations.intercept("UPDATE t SET a = [col with 'quote'] WHERE b = 1") match {
      case Some(Mutations.Update("t", Seq(("a", rhs)), Some(where))) =>
        assert(rhs == "[col with 'quote']" && where == "b = 1")
      case other => fail(s"unexpected parse: $other")
    }
  }
}
