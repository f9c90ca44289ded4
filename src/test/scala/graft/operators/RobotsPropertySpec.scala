package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Seeded adversarial pin on the robots folds — the trickiest
  * expression-fold state machines in the codebase: 200 random bodies
  * (shuffled User-agent stacks, rules, blanks, comments, sitemaps,
  * crawl-delays, junk lines, empty rules, case noise) must parse to
  * EXACTLY what an independent, dead-simple JVM reference parser says,
  * for the `*` posture, a named agent, and the delay extraction — the
  * same documented semantics implemented twice, the JsonlPropertySpec
  * discipline. */
class RobotsPropertySpec extends SparkSpec {
  import spark.implicits._

  /** The documented group model, imperatively: consecutive User-agent
    * lines stack onto one group (blanks and non-rule lines are INERT —
    * they neither end a stack nor a group); a rule line ends the stack
    * and attaches to the current group; later rules keep attaching
    * until the next User-agent starts a new group; a group with no
    * preceding User-agent drops its rules. */
  private case class Group(
      var agents: Set[String] = Set.empty,
      var rules: List[(String, Boolean)] = Nil,
      var delays: List[Double] = Nil)

  private def referenceGroups(body: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var cur: Group = null
    var stacking = false
    body.replaceAll("#[^\n]*", "").split("\r?\n", -1).map(_.trim)
      .foreach { l =>
        val low = l.toLowerCase
        def value = l.replaceFirst("^[A-Za-z-]+\\s*:", "").trim
        if (low.startsWith("user-agent:")) {
          if (!stacking || cur == null) {
            cur = Group(); groups += cur; stacking = true
          }
          cur.agents += value.toLowerCase
        } else if (low.startsWith("disallow:") || low.startsWith("allow:")) {
          stacking = false
          if (cur != null && value.nonEmpty)
            cur.rules :+= (value, low.startsWith("allow:"))
        } else if (low.startsWith("crawl-delay:")) {
          if (cur != null) value.toDoubleOption.foreach(d => cur.delays :+= d)
        } // blanks, sitemaps, junk: inert
      }
    groups.toSeq
  }

  private def effective(groups: Seq[Group], agent: Option[String]) = {
    val a = agent.map(_.trim.toLowerCase)
    val named = a.map(t => groups.filter(_.agents.contains(t)))
      .getOrElse(Nil)
    if (named.nonEmpty) named else groups.filter(_.agents.contains("*"))
  }

  private def refRules(body: String, agent: Option[String]) =
    effective(referenceGroups(body), agent).flatMap(_.rules).toSet

  private def refDelay(body: String, agent: Option[String]): Option[Double] = {
    val ds = effective(referenceGroups(body), agent).flatMap(_.delays)
    if (ds.isEmpty) None else Some(ds.max)
  }

  private def randomBodies(n: Int, seed: Long): Seq[(String, String)] = {
    val rnd = new Random(seed)
    val agents = Seq("*", "bot", "BOT", "Bot", "otherbot", "zz")
    (1 to n).map { i =>
      val lines = (0 until 3 + rnd.nextInt(12)).map { _ =>
        rnd.nextInt(10) match {
          case 0 | 1 => s"User-agent: ${agents(rnd.nextInt(agents.length))}"
          case 2 | 3 => s"Disallow: /p${rnd.nextInt(5)}"
          case 4 => s"Allow: /p${rnd.nextInt(5)}/ok"
          case 5 => if (rnd.nextBoolean()) "Disallow:" else "ALLOW:"
          case 6 => ""
          case 7 => if (rnd.nextBoolean()) "# a comment line"
            else "Sitemap: https://h/s.xml"
          case 8 => s"Crawl-delay: ${if (rnd.nextBoolean())
            rnd.nextInt(20).toString else "soon"}"
          case _ => if (rnd.nextBoolean()) "Whatever: junk" else "noise"
        }
      }
      (s"h$i.example", lines.mkString("\n"))
    }
  }

  test("parseRobots == the JVM reference parser on 200 random bodies, " +
      "for the * posture AND a named agent (case noise included)") {
    val bodies = randomBodies(200, seed = 20260815L)
    val df = bodies.toDF("host", "body")
    Seq(None, Some("bOt")).foreach { agent =>
      val got = UrlOps.parseRobots(df, "host", "body", agent)
        .as[(String, String, Boolean)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
      bodies.foreach { case (host, body) =>
        val want = refRules(body, agent)
        assert(got.getOrElse(host, Set.empty) === want,
          s"agent=$agent host=$host\nBODY:\n$body")
      }
    }
  }

  test("parseCrawlDelays == the reference (group-wide attribution, " +
      "max merge) on the same 200 random bodies") {
    val bodies = randomBodies(200, seed = 20260815L)
    val df = bodies.toDF("host", "body")
    Seq(None, Some("bOt")).foreach { agent =>
      val got = UrlOps.parseCrawlDelays(df, "host", "body", agent)
        .as[(String, Double)].collect().toMap
      bodies.foreach { case (host, body) =>
        val want = refDelay(body, agent)
        assert(got.get(host) === want,
          s"agent=$agent host=$host\nBODY:\n$body")
      }
    }
  }
}
