package graft.linkage

import org.apache.spark.sql.{Dataset, SparkSession}
import scala.util.Random

/** Deterministic synthetic transcript corpus + answer key — the engine's
  * analog of the reference's Faker fixtures and per-site answer keys
  * (testing-and-tuning/faker-sample.csv, build_key.py; FIXTURES.md §2–3).
  *
  * Generated distributedly (spark.range → flatMap, seeded per conv) so the
  * same generator scales from unit tests to bench corpora. Garbles are the
  * transcript transposition of the reference's garbled/clear-text pairs:
  *   - case flips / unicode substitutions / doubled whitespace — removed by
  *     normalization (clean_string path, data_reader.py:108–114)
  *   - character transpositions in body turns (turn ≥ 1, never the last
  *     token) — exercises Jaro-Winkler tolerance while keeping the
  *     [zip, family_name] blocking pass intact (matching.py:401–405)
  *   - punctuation noise in tool names — removed by tool-sig normalization
  *   - ts jitter within the same day — keeps the blocking bucket
  * Negatives include "same first turn, different body" convs (same passB
  * block, address score deliberately below the 0.95 prefilter — analog of
  * "205 GARDEN ST" vs "206 GARDEN ST", matching.py:25–31).
  */
object SynthTranscripts {

  case class Config(
      seed: Long = 42L,
      nConvs: Int = 1000,
      dupFrac: Double = 0.3,
      days: Int = 20,
      maxDupsPerSeed: Int = 3,
      typoProb: Double = 0.7,       // P(a dup gets 1–2 body transpositions)
      sharedFirstTurnFrac: Double = 0.05, // near-miss negatives
      emptyTextFrac: Double = 0.01) // blank-address analog rows

  private val WORDS: Array[String] = {
    // fixed bank; deterministic, ASCII
    val roots = Array(
      "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
      "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
      "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
      "victor", "whiskey", "xray", "yankee", "zulu", "amber", "basalt",
      "cobalt", "dune", "ember", "flint", "garnet", "harbor", "isle",
      "jasper", "krait", "lagoon", "marble", "nectar", "onyx", "pearl",
      "quartz", "reef", "slate", "topaz", "umber", "vapor", "willow",
      "zephyr")
    roots ++ roots.map(_ + "s") ++ roots.map(_.capitalize) ++
      roots.map(r => r + r.length)
  }

  private val TOOLS = Array("search", "calculator", "browser", "python",
    "sql_query", "file_read", "file_write", "email", "calendar", "weather",
    "translate", "maps")

  private val UNICODE_SUBS = Map('e' -> 'é', 'a' -> 'à', 'o' -> 'ö',
    'u' -> 'ü', 'i' -> 'í', 'n' -> 'ñ')

  private val EPOCH_2025 = 1735689600L // 2025-01-01T00:00:00Z, seconds

  private def rngFor(seed: Long, i: Long): Random =
    new Random(seed ^ (i * 0x9E3779B97F4A7C15L))

  private def sentence(rnd: Random, nWords: Int): String =
    Array.fill(nWords)(WORDS(rnd.nextInt(WORDS.length))).mkString(" ")

  /** One seed conversation: user/assistant alternating, occasional tool
    * turns, 0–3 distinct tools, monotone ts within one day. */
  private def seedConv(cfg: Config, i: Long): Vector[Turn] = {
    val rnd = rngFor(cfg.seed, i)
    val convId = s"c$i"
    val day = (i % cfg.days).toInt
    val startSec = EPOCH_2025 + day * 86400L + 3600L * rnd.nextInt(20)
    val nExch = 1 + rnd.nextInt(5) // 1–5 user/assistant exchanges
    val toolCount = rnd.nextInt(4) // 0–3 distinct tools
    val convTools = rnd.shuffle(TOOLS.toVector).take(toolCount)
    val empty = rnd.nextDouble() < cfg.emptyTextFrac
    var turnIdx = 0
    var ts = startSec
    val out = Vector.newBuilder[Turn]
    def add(role: String, text: String, tool: String): Unit = {
      out += Turn(convId, turnIdx, role, if (empty) "" else text, tool,
        new java.sql.Timestamp(ts * 1000L))
      turnIdx += 1
      ts += 10 + rnd.nextInt(110)
    }
    (0 until nExch).foreach { e =>
      add("user", sentence(rnd, 4 + rnd.nextInt(8)), "")
      if (convTools.nonEmpty && rnd.nextDouble() < 0.5) {
        val t = convTools(rnd.nextInt(convTools.size))
        add("tool", "result " + sentence(rnd, 3 + rnd.nextInt(4)), t)
      }
      add("assistant", sentence(rnd, 5 + rnd.nextInt(9)), "")
    }
    out.result()
  }

  private def flipCase(rnd: Random, w: String): String =
    w.map(c => if (rnd.nextDouble() < 0.4) {
      if (c.isUpper) c.toLower else c.toUpper
    } else c)

  private def unicodeify(rnd: Random, w: String): String =
    w.map(c => UNICODE_SUBS.get(c.toLower) match {
      case Some(u) if rnd.nextDouble() < 0.3 =>
        if (c.isUpper) u.toUpper else u
      case _ => c
    })

  private def transposeOnce(rnd: Random, w: String): String =
    if (w.length < 3) w
    else {
      val p = 1 + rnd.nextInt(w.length - 2)
      val a = w.toCharArray
      val t = a(p); a(p) = a(p + 1); a(p + 1) = t
      new String(a)
    }

  /** Garble one turn's text: normalization-invariant noise everywhere;
    * typos only when `allowTypo` (body turns, not the conversation's last
    * token — keeps family_name and the suffix part clean enough). */
  private def garbleText(rnd: Random, text: String, allowTypo: Boolean,
                         typoBudget: Int): (String, Int) = {
    if (text.isEmpty) return (text, 0)
    var used = 0
    val words = text.split(" ").zipWithIndex.map { case (w0, wi) =>
      var w = w0
      if (rnd.nextDouble() < 0.3) w = flipCase(rnd, w)
      if (rnd.nextDouble() < 0.3) w = unicodeify(rnd, w)
      if (allowTypo && used < typoBudget && wi > 0 &&
          rnd.nextDouble() < 0.15) {
        w = transposeOnce(rnd, w); used += 1
      }
      w
    }
    val sep = if (rnd.nextDouble() < 0.3) "  " else " "
    (words.mkString(sep), used)
  }

  private def garbleTool(rnd: Random, tool: String): String =
    if (tool.isEmpty || rnd.nextDouble() < 0.5) tool
    else {
      val p = rnd.nextInt(tool.length)
      tool.substring(0, p) + "-" + tool.substring(p)
    }

  /** Garbled duplicate of a seed conv under a new conv_id. */
  private def garbleConv(cfg: Config, seedTurns: Vector[Turn], i: Long,
                         k: Int): Vector[Turn] = {
    val rnd = rngFor(cfg.seed * 31 + k + 1, i)
    val withTypos = rnd.nextDouble() < cfg.typoProb
    val typoBudget = if (withTypos) 1 + rnd.nextInt(2) else 0
    val jitter = rnd.nextInt(3000)
    var budget = typoBudget
    seedTurns.map { t =>
      // never typo turn 0 (family_name / passB key) nor the last turn
      val allowTypo = budget > 0 && t.turn_idx > 0 &&
        t.turn_idx < seedTurns.length - 1
      val (txt, used) = garbleText(rnd, t.text, allowTypo, budget)
      budget -= used
      t.copy(
        conv_id = s"c$i~$k",
        text = txt,
        tool = garbleTool(rnd, t.tool),
        ts = new java.sql.Timestamp(t.ts.getTime + jitter * 1000L))
    }
  }

  /** Near-miss negative: same first user turn (same passB block key when
    * same day), completely different body. */
  private def nearMissConv(cfg: Config, seedTurns: Vector[Turn],
                           i: Long): Vector[Turn] = {
    val rnd = rngFor(cfg.seed * 101 + 7, i)
    seedTurns.zipWithIndex.map { case (t, idx) =>
      val txt =
        if (idx == 0) t.text // keep the first turn verbatim
        else sentence(rnd, 5 + rnd.nextInt(8))
      t.copy(conv_id = s"c$i!n", text = txt,
        ts = new java.sql.Timestamp(t.ts.getTime + 1800L * 1000L))
    }
  }

  private def dupsFor(cfg: Config, i: Long): Int = {
    val rnd = rngFor(cfg.seed * 17 + 3, i)
    if (rnd.nextDouble() < cfg.dupFrac) 1 + rnd.nextInt(cfg.maxDupsPerSeed)
    else 0
  }

  private def hasNearMiss(cfg: Config, i: Long): Boolean =
    rngFor(cfg.seed * 57 + 11, i).nextDouble() < cfg.sharedFirstTurnFrac

  /** All turns for conv index i: seed + garbled dups + near-miss. */
  def turnsFor(cfg: Config, i: Long): Seq[Turn] = {
    val seedTurns = seedConv(cfg, i)
    val nd = dupsFor(cfg, i)
    val dups = (0 until nd).flatMap(k => garbleConv(cfg, seedTurns, i, k))
    val near = if (hasNearMiss(cfg, i)) nearMissConv(cfg, seedTurns, i)
               else Vector.empty
    seedTurns ++ dups ++ near
  }

  def keyFor(cfg: Config, i: Long): Seq[AnswerKeyRow] = {
    val nd = dupsFor(cfg, i)
    val seedId = s"c$i"
    AnswerKeyRow(seedId, seedId, seedId) +:
      (0 until nd).map(k => AnswerKeyRow(s"c$i~$k", seedId, seedId))
    // near-miss convs are their own singleton truth clusters:
    // intentionally NOT in the key (treated like any unrelated conv)
  }

  def transcripts(spark: SparkSession, cfg: Config): Dataset[Turn] = {
    import spark.implicits._
    spark.range(cfg.nConvs).flatMap(i => turnsFor(cfg, i))
  }

  def answerKey(spark: SparkSession, cfg: Config): Dataset[AnswerKeyRow] = {
    import spark.implicits._
    spark.range(cfg.nConvs).flatMap(i => keyFor(cfg, i))
  }
}
