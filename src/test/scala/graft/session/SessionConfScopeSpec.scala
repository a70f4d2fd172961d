package graft.session

import graft.SparkSpec

/** Session-scoped conf pins (UTC timezone, NTZ-inference off) must be
  * restored on close() so an embedding application's unrelated queries
  * keep their pre-session semantics. */
class SessionConfScopeSpec extends SparkSpec {

  test("close() restores timeZone and parquet NTZ-inference confs") {
    val tzKey = "spark.sql.session.timeZone"
    val ntzKey = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val (prevTz, prevNtz) = (spark.conf.get(tzKey), spark.conf.get(ntzKey))
    spark.conf.set(tzKey, "America/New_York")
    spark.conf.set(ntzKey, "true")
    try {
      val dir = tmpDir("confscope")
      writeFile(dir, "t.csv", "a,b\n1,x\n")
      val sess = GraftSession.open(spark, dir.toString)
      assert(spark.conf.get(tzKey) == "UTC")
      assert(spark.conf.get(ntzKey) == "false")
      assert(sess.sql("SELECT COUNT(*) AS n FROM t").collect().head.getLong(0) == 1L)
      sess.close()
      assert(spark.conf.get(tzKey) == "America/New_York")
      assert(spark.conf.get(ntzKey) == "true")
    } finally {
      // hand the shared session back exactly as this test found it
      spark.conf.set(tzKey, prevTz)
      spark.conf.set(ntzKey, prevNtz)
    }
  }
}
