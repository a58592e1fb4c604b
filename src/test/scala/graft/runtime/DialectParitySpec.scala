package graft.runtime

import org.scalatest.funsuite.AnyFunSuite

/** Holds every dialect to the same contract, mirroring the reference's
  * parity suite (SqlDialectParityTests.cs:10-196): a provider added later
  * has to earn its place rather than quietly skipping half of what the
  * pipeline assumes. Every test iterates Config.SqlDialects on purpose —
  * adding a dialect adds cases here for free. */
class DialectParitySpec extends AnyFunSuite {

  private val dialects = Config.SqlDialects.values.toSeq

  test("more than one dialect is registered (parity is meaningless with one)") {
    assert(Config.SqlDialects.size > 1)
  }

  test("every dialect is fully populated") {
    dialects.foreach { d =>
      assert(d.name.trim.nonEmpty)
      assert(d.callTemplate.trim.nonEmpty)
      assert(d.connectionDefaults.nonEmpty)
    }
  }

  test("every dialect resolves by its own name") {
    dialects.foreach(d => assert(Config.dialect(d.name).contains(d)))
  }

  test("the procedure call renders without leftover placeholders") {
    dialects.foreach { d =>
      val sql = d.callSql("schema.my_proc")
      assert(sql.contains("schema.my_proc"))
      assert(!sql.contains("{proc}"))
    }
  }

  test("every dialect binds exactly the one shared JSON parameter") {
    dialects.foreach { d =>
      val sql = d.callSql("p")
      assert(sql.count(_ == '?') == 1,
        s"${d.name}: expected exactly one parameter marker in '$sql'")
    }
  }

  test("every dialect identifies itself to the server") {
    // Operators grep for this when working out which connections are ours.
    dialects.foreach { d =>
      assert(d.connectionDefaults.keys.exists(_.toLowerCase.contains("application")),
        s"${d.name} has no Application* connection default")
    }
  }

  test("connection defaults never override the user") {
    dialects.foreach { d =>
      val (key, defaultValue) = d.connectionDefaults.head
      val merged = Config.mergeConnectionProps(
        Map(key -> "user-chosen"), d.connectionDefaults)
      assert(merged(key) == "user-chosen" && merged(key) != defaultValue)
      // case-insensitive: a differently-cased user key still wins
      val mergedCased = Config.mergeConnectionProps(
        Map(key.toUpperCase -> "user-chosen"), d.connectionDefaults)
      assert(!mergedCased.get(key).contains(defaultValue))
    }
  }

  test("a dialect without a server watermark must be seedable through the procedure") {
    dialects.foreach { d =>
      d.currentVersionSql match {
        case None =>
          assert(d.callSql("p").contains("?"),
            s"${d.name}: no server watermark and the call carries no parameter — seeding impossible")
          assert(Config.requiresSeedMode(d.name))
        case Some(sql) =>
          assert(sql.trim.nonEmpty)
          assert(!Config.requiresSeedMode(d.name))
      }
    }
  }

  test("every alias resolves to a registered dialect, case- and space-insensitively") {
    Config.DialectAliases.keys.foreach { alias =>
      val expected = Config.dialect(alias)
      assert(expected.nonEmpty, s"alias '$alias' resolves to nothing")
      assert(Config.dialect(s"  ${alias.toUpperCase}  ") == expected)
    }
  }
}
