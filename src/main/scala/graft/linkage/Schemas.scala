package graft.linkage

import org.apache.spark.sql.types._

/** Core schemas (SURVEY.md §1.3).
  *
  * Input is the transcripts table from BASELINE.json `input_hint`:
  * (conv_id, turn_idx, role, text, tool, ts). The folded per-conversation
  * record carries the reference-analog linkage fields under the
  * *reference's* names (extract.py:26–35) so the scoring stack
  * (matching.py) is auditable side-by-side:
  *
  *   family_name  ← normalized text of the first user-role turn
  *   given_name   ← normalized text of the last user-role turn
  *   phone_number ← sorted distinct normalized tool names, concatenated
  *   addr         ← struct over the full normalized conversation text
  *                  (number = leading token, street = body, suffix = last
  *                  token, prefix/value = tool-call "occupancy" analog)
  *   household_zip← date(min ts) — block-only field (matching.py:502–505)
  */
object Schemas {
  val transcripts: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("tool", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false)
  ))

  val addrStruct: StructType = StructType(Seq(
    StructField("number", StringType, nullable = false),
    StructField("street", StringType, nullable = false),
    StructField("suffix", StringType, nullable = false),
    StructField("prefix", StringType, nullable = false),
    StructField("value", StringType, nullable = false),
    StructField("full", StringType, nullable = false)
  ))
}

/** One transcript turn (typed Dataset row). */
case class Turn(conv_id: String, turn_idx: Int, role: String, text: String,
                tool: String, ts: java.sql.Timestamp)

/** Answer-key row: truth cluster = seed conversation + its garbled dups
  * (reference testing-and-tuning/build_key.py:30–50 analog). */
case class AnswerKeyRow(conv_id: String, seed_conv_id: String,
                        cluster_id: String)
