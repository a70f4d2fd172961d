package graft.session

import graft.SparkSpec

/** Port of the reference's integration suite shape over the `company/`
  * relational fixture (FIXTURES.md; `filesql_integration_test.go:14-1117`):
  * multi-join analytics, LEFT JOIN + IS NULL, EXISTS, UNION, HAVING,
  * subqueries, window functions, sequential mutation flows,
  * referential-integrity counts. Fixture generated to FIXTURES.md schemas
  * (nullable cells = empty strings). */
class CompanyIntegrationSpec extends SparkSpec {

  private lazy val sess: GraftSession = {
    val dir = tmpDir("company")
    writeFile(dir, "user.csv",
      """id,name,email,age,department_id
        |1,Sato,sato@example.com,36.0,1
        |2,Suzuki,suzuki@example.com,29.0,2
        |3,Takahashi,takahashi@example.com,,1
        |4,Tanaka,tanaka@example.com,45.0,3
        |5,Ito,ito@example.com,31.0,2
        |6,Watanabe,watanabe@example.com,27.0,
        |""".stripMargin)
    writeFile(dir, "department.csv",
      """id,name,location
        |1,Engineering,Tokyo
        |2,Sales,Osaka
        |3,HR,
        |4,Research,Kyoto
        |""".stripMargin)
    writeFile(dir, "orders.csv",
      """id,user_id,amount,status,created_at
        |1,1,1500.5,shipped,2023-01-01 00:00:00
        |2,1,299.99,pending,2023-02-15 09:30:00
        |3,2,75.25,delivered,2023-03-20 14:00:00
        |4,3,1200.0,,2023-04-01 08:15:00
        |5,5,480.75,shipped,2023-05-11 17:45:00
        |6,2,60.0,pending,2023-06-30 12:00:00
        |""".stripMargin)
    writeFile(dir, "salary.csv",
      """id,user_id,base_salary,bonus
        |1,1,650000,120000.5
        |2,2,480000,
        |3,3,520000,80000.0
        |4,4,700000,150000.25
        |5,5,495000,60000.0
        |""".stripMargin)
    writeFile(dir, "project.csv",
      """id,name,department_id,budget
        |1,Apollo,1,
        |2,Hermes,2,
        |3,Atlas,1,
        |""".stripMargin)
    writeFile(dir, "user_project.csv",
      """id,user_id,project_id,role
        |1,1,1,manager
        |2,3,1,developer
        |3,2,2,manager
        |4,5,2,tester
        |5,1,3,developer
        |""".stripMargin)
    GraftSession.open(spark, dir.toString)
  }

  test("schema inference over the fixture matches FIXTURES.md") {
    val u = sess.table("user").schema
    assert(u("id").dataType.typeName == "long")
    assert(u("age").dataType.typeName == "double") // REAL with nullable empties
    val o = sess.table("orders").schema
    assert(o("created_at").dataType.typeName == "timestamp")
    val p = sess.table("project").schema
    assert(p("budget").dataType.typeName == "string") // all-empty ⇒ TEXT
  }

  test("4-way join analytics") {
    val rows = sess.sql(
      """SELECT d.name AS dept, up.role, COUNT(*) AS n
        |FROM user u
        |JOIN department d ON u.department_id = d.id
        |JOIN user_project up ON up.user_id = u.id
        |JOIN project p ON p.id = up.project_id
        |GROUP BY d.name, up.role ORDER BY dept, role""".stripMargin).collect()
    assert(rows.length == 4)
    assert(rows.head.getString(0) == "Engineering")
  }

  test("LEFT JOIN + IS NULL: departments with no users") {
    val r = sess.sql(
      """SELECT d.name FROM department d
        |LEFT JOIN user u ON u.department_id = d.id
        |WHERE u.id IS NULL ORDER BY d.name""".stripMargin).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("Research"))
  }

  test("EXISTS and NOT EXISTS referential-integrity counts") {
    assert(sess.sql(
      """SELECT COUNT(*) FROM user u
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.user_id = u.id)""".stripMargin)
      .head().getLong(0) == 4)
    assert(sess.sql(
      """SELECT COUNT(*) FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM user u WHERE u.id = o.user_id)""".stripMargin)
      .head().getLong(0) == 0) // no orphan orders
  }

  test("UNION of name sources") {
    val n = sess.sql(
      """SELECT name FROM user UNION SELECT name FROM department""".stripMargin).count()
    assert(n == 10) // 6 users + 4 departments, no overlap
  }

  test("HAVING over aggregates with NULL-tolerant AVG") {
    val r = sess.sql(
      """SELECT user_id, COUNT(*) AS n, SUM(amount) AS total FROM orders
        |GROUP BY user_id HAVING COUNT(*) >= 2 ORDER BY user_id""".stripMargin).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("scalar subquery + window over salary") {
    val r = sess.sql(
      """SELECT u.name, s.base_salary,
        |  RANK() OVER (ORDER BY s.base_salary DESC) AS rnk
        |FROM salary s JOIN user u ON u.id = s.user_id
        |WHERE s.base_salary > (SELECT AVG(base_salary) FROM salary)
        |ORDER BY rnk""".stripMargin).collect()
    assert(r.head.getString(0) == "Tanaka")
  }

  test("sequential mutation flow: INSERT → UPDATE → DELETE") {
    sess.sql("INSERT INTO orders VALUES (7, 6, 42.0, 'pending', timestamp '2023-07-01 00:00:00')")
    assert(sess.sql("SELECT COUNT(*) FROM orders").head().getLong(0) == 7)
    sess.sql("UPDATE orders SET status = 'shipped' WHERE status = 'pending'")
    assert(sess.sql("SELECT COUNT(*) FROM orders WHERE status = 'shipped'").head().getLong(0) == 5)
    sess.sql("DELETE FROM orders WHERE amount < 70")
    assert(sess.sql("SELECT COUNT(*) FROM orders").head().getLong(0) == 5)
    // empty-string status (reference semantics: empty TEXT cells stay '',
    // not NULL — SQLite stores '' too) untouched by predicate mutations
    assert(sess.sql("SELECT COUNT(*) FROM orders WHERE status = ''").head().getLong(0) == 1)
  }
}
