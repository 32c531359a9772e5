package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** PII scrubbing — the redaction pass every public-web training corpus
  * runs before anything else: emails, URLs, phone-like digit runs, and
  * IPv4 addresses replaced with typed placeholder tokens, plus per-doc
  * match counts for filtering/reporting.
  *
  * Pure per-row `regexp_replace`/`regexp_count` chains: codegen'd,
  * scan-speed, zero shuffle, trivially parallel at any scale. Patterns
  * deliberately use no alternation/lookaround so Java regex (Spark)
  * and RE2 (DuckDB oracle) match identically; replacement order is
  * fixed (URL first, so emails inside URLs don't double-fire). */
object Redact {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val urlRe = "https?://[^ ]+"
  val ipRe = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
  val phoneRe = "[+][0-9][0-9 -]{7,}[0-9]"

  /** Redacted text: URL → email → IP → phone, in that order. */
  def redact(text: Column): Column = {
    val noUrl = regexp_replace(text, urlRe, "<URL>")
    val noEmail = regexp_replace(noUrl, emailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, ipRe, "<IP>")
    regexp_replace(noIp, phoneRe, "<PHONE>")
  }

  /** Documents with redacted text + per-category counts (counts are
    * computed on the same intermediate the replacement saw, so they
    * always equal the number of substitutions). */
  def redactDocs(spark: SparkSession, dir: String): DataFrame = {
    val noUrl = regexp_replace(col("text"), urlRe, "<URL>")
    val noEmail = regexp_replace(noUrl, emailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, ipRe, "<IP>")
    Tables.documentsSpread(spark, dir).select(
      col("doc_id"),
      redact(col("text")).as("clean_text"),
      regexp_count(col("text"), lit(urlRe)).as("n_urls"),
      regexp_count(noUrl, lit(emailRe)).as("n_emails"),
      regexp_count(noEmail, lit(ipRe)).as("n_ips"),
      regexp_count(noIp, lit(phoneRe)).as("n_phones"))
  }

  val redactDocsSql: String =
    s"""SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
       |    '$urlRe', '<URL>', 'g'),
       |    '$emailRe', '<EMAIL>', 'g'),
       |    '$ipRe', '<IP>', 'g'),
       |    '$phoneRe', '<PHONE>', 'g') AS clean_text,
       |  len(regexp_extract_all(text, '$urlRe')) AS n_urls,
       |  len(regexp_extract_all(regexp_replace(text, '$urlRe', '<URL>', 'g'),
       |      '$emailRe')) AS n_emails,
       |  len(regexp_extract_all(regexp_replace(regexp_replace(text,
       |      '$urlRe', '<URL>', 'g'), '$emailRe', '<EMAIL>', 'g'),
       |      '$ipRe')) AS n_ips,
       |  len(regexp_extract_all(regexp_replace(regexp_replace(regexp_replace(text,
       |      '$urlRe', '<URL>', 'g'), '$emailRe', '<EMAIL>', 'g'),
       |      '$ipRe', '<IP>', 'g'), '$phoneRe')) AS n_phones
       |FROM documents""".stripMargin
}
