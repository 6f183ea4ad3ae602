package graft

/** r8 verdict #2, machine-checked: the registry's scale classification
  * is structurally sound. Every FixtureDiagnostic row (a deliberately
  * fixture-bound — typically quadratic — recall/exactness baseline)
  * must name a registered, scale-SAFE twin so a 100 TB user always has
  * the production plan one lookup away; the four known quadratic
  * baselines must actually carry the flag (so a future refactor can't
  * silently drop the quarantine); and the exposed string form parses.
  */
class ScaleClassSpec extends SparkSpec {

  test("every FixtureDiagnostic names a registered Safe twin") {
    val reg = SparkEntry.registry
    val diags = reg.collect {
      case (name, q) => q.scale match {
        case ScaleClass.FixtureDiagnostic(twin) => Some(name -> twin)
        case ScaleClass.Safe => None
      }
    }.flatten.toMap
    assert(diags.nonEmpty, "expected at least one FixtureDiagnostic row")
    diags.foreach { case (name, twin) =>
      assert(reg.contains(twin),
        s"$name names twin $twin which is not registered")
      assert(reg(twin).scale == ScaleClass.Safe,
        s"$name's twin $twin must itself be Safe (no diagnostic chains)")
      assert(twin != name, s"$name cannot be its own twin")
    }
  }

  test("the known quadratic baselines are flagged") {
    val cls = SparkEntry.scaleClass
    Seq("q_sim_knn_graph", "q_dedup_er_entities", "q_vec_cos_histogram",
      "q_dedup_fuzzy_names").foreach { n =>
      assert(cls.get(n).exists(_.startsWith("fixture_diagnostic:")),
        s"$n must be flagged fixture_diagnostic (got ${cls.get(n)})")
    }
  }

  test("scaleClass covers the registry and parses") {
    val cls = SparkEntry.scaleClass
    assert(cls.keySet == SparkEntry.queries.keySet)
    cls.values.foreach { v =>
      assert(v == "safe" ||
        (v.startsWith("fixture_diagnostic:") &&
          v.stripPrefix("fixture_diagnostic:").nonEmpty), v)
    }
  }
}
