package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the URL canonicalizer: idempotence (normalizing a
  * normalized URL is a no-op — the contract that lets normalized keys be
  * stored and re-processed safely) and invariance under the noise
  * classes the t31 gate plants (case, default ports, fragments,
  * tracking params, one trailing slash). Driven in BATCHES through one
  * DataFrame per property check (not one Spark job per sample). */
class WebPropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  private val label: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaNumChar, Gen.const('-')))
  } yield (h :: t).mkString

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "HTTPS", "ftp")
    user <- Gen.option(Gen.oneOf("User:Pw@", "a@"))
    host <- Gen.listOfN(3, label).map(_.mkString("."))
    hostCased <- Gen.oneOf(host, host.toUpperCase)
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.listOf(label).map(ls => ls.map("/" + _).mkString)
    slash <- Gen.oneOf("", "/")
    params <- Gen.listOf(Gen.oneOf("id=3", "utm_source=g", "A=B%20c", "ref",
      "gclid=z", "q=a?b", "x="))
    frag <- Gen.oneOf("", "#sec", "#a#b")
  } yield s"$scheme://${user.getOrElse("")}$hostCased$port$path$slash" +
    (if (params.nonEmpty) "?" + params.mkString("&") else "") + frag

  private def normBatch(urls: Seq[String]): Seq[String] =
    urls.toDF("u").select(Web.normalizeUrl(col("u")).as("n"))
      .collect().map(_.getString(0)).toSeq

  test("property: normalizeUrl is idempotent on URL-shaped inputs") {
    check(Prop.forAll(Gen.listOfN(20, urlGen)) { urls =>
      val once = normBatch(urls)
      val twice = normBatch(once)
      twice == once
    })
  }

  test("property: noise classes collapse — fragments, tracking params, default ports, case") {
    check(Prop.forAll(Gen.listOfN(10, urlGen)) { urls =>
      val noisy = urls.flatMap { u =>
        val noFrag = u.takeWhile(_ != '#')
        val sep = if (noFrag.contains("?")) "&" else "?"
        Seq(u, noFrag + "#other", noFrag + sep + "utm_campaign=zz")
      }
      // each url and its re-noised variants normalize identically
      val n = normBatch(noisy)
      n.grouped(3).forall(g => g.distinct.size == 1)
    })
  }

  test("property: host parsing — registrableDomain of hostOf never widens beyond the host") {
    check(Prop.forAll(Gen.listOfN(20, urlGen)) { urls =>
      val rows = urls.toDF("u").select(
          Web.hostOf(col("u")).as("h"),
          Web.registrableDomain(Web.hostOf(col("u"))).as("d"))
        .collect().map(r => (r.getString(0), r.getString(1)))
      rows.forall { case (h, d) =>
        (h.isEmpty && d.isEmpty) || (h == d || h.endsWith("." + d))
      }
    })
  }
}
