package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII scrubbing: mask e-mail addresses and long digit runs (phone /
  * account / card numbers) in a text column — the redaction pass a
  * training corpus runs before anything ships.
  *
  * Row-local regexp work (codegen'd `regexp_replace` / `regexp_count`
  * built-ins, no UDFs) — chunks at scan speed at any corpus size. The
  * patterns are deliberately in the common regex subset Java and
  * DuckDB's RE2 interpret identically, so the masking is
  * oracle-verifiable end-to-end.
  */
object Scrub {

  /** Conservative e-mail shape (local@domain.tld). */
  val EmailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Digit runs long enough to be identifiers, not quantities. */
  val LongNumberPattern: String = "[0-9]{6,}"

  /** All input columns plus `n_emails`, `n_longnums` (match counts on
    * the ORIGINAL text) and `masked` (e-mails replaced first, then
    * digit runs — the order matters and the oracle mirrors it). */
  def mask(df: DataFrame, textCol: String,
      emailToken: String = "<EMAIL>",
      numToken: String = "<NUM>"): DataFrame =
    df.withColumn("n_emails",
        regexp_count(col(textCol), lit(EmailPattern)).cast("long"))
      .withColumn("n_longnums",
        regexp_count(col(textCol), lit(LongNumberPattern)).cast("long"))
      .withColumn("masked",
        regexp_replace(
          regexp_replace(col(textCol), EmailPattern, emailToken),
          LongNumberPattern, numToken))
}
