package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII scrubbing for webtext corpora (the C4/CCNet-style pre-training
 * hygiene pass): replace emails, phone numbers, and IPv4 addresses with
 * typed placeholder tokens and count what was removed.
 *
 * Pure `regexp_replace`/`regexp_count`-style Column expressions — one
 * codegen'd projection over the scan, no UDF, no shuffle; at 100 TB the
 * scrub rides the same pass as extraction and never materializes an
 * intermediate copy of the corpus.
 *
 * Patterns are deliberately conservative (high precision over recall —
 * scrubbing prose that merely looks like a phone number damages training
 * data more than a missed digit string leaks).
 */
object Redact {

  /** local@domain.tld with word boundaries. */
  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""

  /** International-ish phone: optional +CC, then 3 groups of 3-4 digits
    * separated by spaces, dots or dashes (min 10 digits total keeps
    * years/prices out). */
  val PhoneRe = """\+?\d{1,3}[-. ]\d{3}[-. ]\d{3}[-. ]?\d{2,4}"""

  /** Dotted-quad IPv4 (word-bounded, 1-3 digits per octet). */
  val Ipv4Re = """(?<!\d)\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}(?!\d)"""

  private def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** Count of each PII class found in `text`. Each count runs on text with
    * the EARLIER scrub classes already masked (email -> IP -> phone), so
    * the counts are disjoint and sum to the number of spans `scrub`
    * replaces: `PhoneRe` also matches a dotted IPv4 whose last three octets
    * happen to be 3 digits (`192.168.100.200`) and digit runs inside an
    * email's local part (`1-555-123-4567@y.com`); `Ipv4Re` matches dotted
    * quads inside email local parts. Counting each class on the
    * already-masked text mirrors exactly what scrub tags each span as. */
  def emailCount(text: Column): Column = countMatches(text, EmailRe)
  def ipv4Count(text: Column): Column =
    countMatches(regexp_replace(text, EmailRe, "<EMAIL>"), Ipv4Re)
  def phoneCount(text: Column): Column =
    countMatches(
      regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"),
      PhoneRe)

  /** Scrubbed text: emails, then IPs, then phones, replaced by typed
    * placeholders. Order matters twice over: emails can contain digit runs,
    * and `PhoneRe` can match a dotted IPv4 (see `phoneCount`) — IPs must be
    * replaced before the phone pass so a quad is tagged `<IP>`, never
    * `<PHONE>`. */
  def scrub(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    val ip = regexp_replace(e, Ipv4Re, "<IP>")
    regexp_replace(ip, PhoneRe, "<PHONE>")
  }
}
