package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL operators for web-corpus preparation — the step BEFORE document
  * text ever loads in a CCNet/RefinedWeb-style pipeline: URL
  * canonicalization (the key of the cheapest dedup any web pipeline
  * runs), host/registrable-domain extraction (the unit of blocklists,
  * per-domain caps and composition stats), and a broadcast blocklist
  * screen.
  *
  * Everything is pure per-row expressions — RE2-safe regex, `translate`
  * ASCII case folding (the cross-engine rule: Java and utf8proc full
  * case mappings disagree on non-ASCII), split/filter/array_join HOFs
  * whose lambdas reference only their own argument (the HOF-blocks-CSE
  * trap avoided) — whole-stage codegen, zero shuffle, linear scale-out,
  * and every step replayable by the t31 DuckDB oracle.
  */
object Web {

  private val asciiFold: Column => Column =
    c => translate(c, TextAnalysis.AsciiUpper, TextAnalysis.AsciiLower)

  /** Query parameters dropped by [[normalizeUrl]]: pure click-tracking
    * noise that splits otherwise-identical URLs. Matched on the param
    * NAME (the `n=` prefix or a bare `n`). */
  val TrackingParamRe = "^(utm_[^=&]*|gclid|fbclid|msclkid|ref)(=.*)?$"

  /** Canonical URL form for dedup and filtering. Steps, in order:
    *
    *  1. trim;
    *  2. fragment strip (`#…` never reaches the server);
    *  3. ASCII-lowercase the scheme and host:port ONLY (path, query AND
    *     userinfo are case-significant by RFC 3986);
    *  4. default-port strip, scheme-conditional (`:80` only under
    *     `http://`, `:443` only under `https://` — `https://h:80` is a
    *     distinct origin and stays);
    *  5. split at the first `?`: the pre-query part loses one trailing
    *     `/` (`…/a/` ≡ `…/a`, `host/` ≡ `host`), the query loses
    *     [[TrackingParamRe]] params — dropped entirely (with its `?`)
    *     when nothing survives;
    *  6. a scheme-less input passes through steps 1/2/5 unchanged
    *     otherwise (no authority to case-fold).
    *
    * Deliberately NOT done (documented deviations from heavyweight
    * canonicalizers): no IDN/percent-encoding normalization, no query
    * param re-ordering (order can be semantic), no `www.` strip (a real
    * host — [[registrableDomain]] is the level at which `www.` folds). */
  def normalizeUrl(url: Column): Column = {
    import Dedup.bindOnce
    // Every multiply-referenced subtree is bound ONCE via bindOnce —
    // the raw inline form re-evaluated the regex chains ~6-8× per row
    // (when-branches defeat codegen CSE); binding measured ~6× on the
    // 6M-row ScaleProbe. Values are identical: same ops, same order.
    bindOnce(regexp_replace(trim(url), "#.*", "")) { t =>
      // authority prefix "scheme://[userinfo@]host[:port]" — [^/?#]*
      // stops at the path
      bindOnce(regexp_extract(t, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)) { prefix =>
        // fold the scheme and host:port ONLY — userinfo is
        // case-significant by RFC 3986 (folding it would merge distinct
        // users' URLs). The greedy [^/?#]* before '@' splits at the
        // LAST '@' of the authority.
        val foldedPrefix =
          bindOnce(regexp_extract(prefix, "^([A-Za-z][A-Za-z0-9+.-]*://)", 1)) { schemePart =>
            bindOnce(substring(prefix, length(schemePart) + 1, lit(Int.MaxValue))) { afterScheme =>
              bindOnce(regexp_extract(afterScheme, "^([^/?#]*@)", 1)) { userinfo =>
                val hostPort =
                  substring(afterScheme, length(userinfo) + 1, lit(Int.MaxValue))
                concat(asciiFold(schemePart), userinfo, asciiFold(hostPort))
              }
            }
          }
        // default-port strip is SCHEME-conditional: https://h:80 is a
        // real non-default origin and must not merge with https://h
        val portStripped = regexp_replace(regexp_replace(foldedPrefix,
          "^(http://[^/?#]*):80$", "$1"), "^(https://[^/?#]*):443$", "$1")
        bindOnce(when(length(prefix) > 0,
          concat(portStripped, substring(t, length(prefix) + 1, lit(Int.MaxValue))))
          .otherwise(t)) { u =>
          // split at the first '?' (later '?' are query content and
          // move with it)
          bindOnce(instr(u, "?")) { qpos =>
            val base = regexp_replace(
              when(qpos > 0, substring(u, lit(1), qpos - 1)).otherwise(u), "/$", "")
            bindOnce(filter(split(substring(u, qpos + 1, lit(Int.MaxValue)), "&"),
              p => !p.rlike(TrackingParamRe))) { kept =>
              when(qpos > 0 && size(kept) > 0,
                concat(base, lit("?"), array_join(kept, "&")))
                .otherwise(base)
            }
          }
        }
      }
    }
  }

  /** Host of a URL: the authority without userinfo or port; empty
    * string when the input has no `scheme://` authority. Case-folded
    * (ASCII) — host names are case-insensitive. */
  def hostOf(url: Column): Column =
    asciiFold(regexp_replace(regexp_replace(
      regexp_extract(trim(url), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
      "^[^@]*@", ""), ":[0-9]*$", ""))

  /** Multi-part TLD second labels for the [[registrableDomain]]
    * heuristic (`co.uk`, `com.au`, …). */
  val MultiPartSecond: Seq[String] =
    Seq("co", "com", "net", "org", "gov", "ac", "edu")

  /** Registrable domain (eTLD+1) of a host, by heuristic: the last two
    * labels, or the last three when the penultimate label is a common
    * multi-part-TLD second ([[MultiPartSecond]]) under a 2-letter
    * country TLD (`a.b.co.uk` → `b.co.uk`). A documented approximation
    * of the Public Suffix List (which is a live external artifact, not
    * embeddable here); single-label hosts pass through. */
  def registrableDomain(host: Column): Column = {
    import Dedup.bindOnce
    // host (often a hostOf(...) tree) and the split are bound once —
    // the inline form re-ran the split ~4× and the caller's host tree
    // 2× per row.
    bindOnce(host) { h =>
      bindOnce(split(h, "\\.")) { labels =>
        bindOnce(size(labels)) { n =>
          val take = when(n > lit(2) &&
              element_at(labels, n - 1).isin(MultiPartSecond.map(lit(_)): _*) &&
              length(element_at(labels, n)) === 2, lit(3))
            .otherwise(lit(2))
          when(n <= 1, h)
            .otherwise(array_join(slice(labels, greatest(n - take + 1, lit(1)), take), "."))
        }
      }
    }
  }

  /** Drop rows whose registrable domain appears in `blocked` (one
    * `domain` column) — a BROADCAST left-anti join: the blocklist is
    * small by nature, the corpus side never shuffles. */
  def blocklistScreen(df: DataFrame, domainCol: String,
      blocked: DataFrame): DataFrame =
    df.join(broadcast(blocked.select(col("domain").as(domainCol))),
      Seq(domainCol), "left_anti")
}
