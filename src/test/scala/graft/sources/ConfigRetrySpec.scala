package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Config parity + retry semantics — pure JVM, no Spark session. */
class ConfigRetrySpec extends AnyFunSuite {

  test("the reference's nested config.yaml layout loads as-is") {
    val yaml =
      """input:
        |  file: "companies.csv"
        |  company_column: "company_name"
        |  reg_column: null
        |  sheet: "Sheet1"
        |  filter_thai: true
        |output:
        |  revenue_file: "dbd_revenue.csv"
        |  not_found_file: "dbd_not_found.csv"
        |  batch_dir: "batches_v2"
        |  force_overwrite: false
        |search:
        |  max_pages: 100
        |  similarity_threshold: 0.75
        |processing:
        |  workers: 5
        |  batch_size: 20
        |  delay_between_requests: 1
        |  start_index: 0
        |retry:
        |  max_retries: 3
        |  extra_wait_per_retry: 2
        |extraction:
        |  target_years: [2565, 2566]
        |browser:
        |  headless: true
        |""".stripMargin
    val cfg = GraftConfig.fromYaml(yaml)
    assert(cfg.companyColumn == "company_name")
    assert(cfg.regColumn.isEmpty)
    assert(cfg.sheet.contains("Sheet1"))
    assert(cfg.targetYears.contains(Seq(2565, 2566)))
    // explicit null = the reference's TARGET_YEARS = None (all years)
    assert(GraftConfig.fromYaml("extraction:\n  target_years: null\n")
      .targetYears.isEmpty)
    assert(cfg.filterEntities)
    assert(cfg.outputPath == "dbd_revenue.csv")
    assert(cfg.notFoundPath == "dbd_not_found.csv")
    assert(!cfg.forceOverwrite)
    assert(cfg.similarityThreshold == 0.75)
    assert(cfg.maxPages == 100)
    assert(cfg.batchSize == 20)
    assert(cfg.startIndex == 0)
    assert(cfg.maxRetries == 3)
    assert(cfg.extraWaitPerRetrySec == 2)
  }

  test("generated default config round-trips to the code defaults") {
    // the reference's generate_default_config contract: the emitted
    // skeleton, loaded back, must equal an untouched GraftConfig()
    assert(GraftConfig.fromYaml(GraftConfig.defaultYaml) == GraftConfig())
    val dir = java.nio.file.Files.createTempDirectory("graft-cfg")
    val p = dir.resolve("config.yaml").toString
    GraftConfig.writeDefault(p)
    assert(GraftConfig.fromFile(p) == GraftConfig())
    // no silent overwrite of an existing config
    intercept[IllegalArgumentException] { GraftConfig.writeDefault(p) }
  }

  test("flat JSON surface keeps working, incl. max_token_freq null vs absent") {
    assert(GraftConfig.fromJson("{}").maxTokenFreq.contains(100000L))
    assert(GraftConfig.fromJson("""{"max_token_freq": 500}""").maxTokenFreq.contains(500L))
    assert(GraftConfig.fromJson("""{"max_token_freq": null}""").maxTokenFreq.isEmpty)
    val cfg = GraftConfig.fromJson(
      """{"company_column":"c","similarity_threshold":0.4,"max_retries":7}""")
    assert(cfg.companyColumn == "c")
    assert(cfg.similarityThreshold == 0.4)
    assert(cfg.maxRetries == 7)
  }

  test("fromFile dispatches on extension") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cfg")
    val y = dir.resolve("c.yaml")
    java.nio.file.Files.writeString(y, "search:\n  similarity_threshold: 0.33\n")
    assert(GraftConfig.fromFile(y.toString).similarityThreshold == 0.33)
    val j = dir.resolve("c.json")
    java.nio.file.Files.writeString(j, """{"similarity_threshold": 0.44}""")
    assert(GraftConfig.fromFile(j.toString).similarityThreshold == 0.44)
  }

  test("retry: linear backoff, succeeds after transients, rethrows after budget") {
    import scala.concurrent.duration._
    var sleeps = List.empty[Long]
    var calls = 0
    val got = Retry.withRetries(3, 2.seconds, ms => sleeps :+= ms) {
      calls += 1
      if (calls < 3) throw new java.io.IOException("transient")
      42
    }
    assert(got == 42 && calls == 3)
    assert(sleeps == List(2000L, 4000L)) // attempt n waits n × extra

    var calls2 = 0
    val e = intercept[java.io.IOException](
      Retry.withRetries(2, 1.second, _ => ()) { calls2 += 1; throw new java.io.IOException("x") })
    assert(e.getMessage == "x" && calls2 == 3)
  }

  test("retry does not mask programming errors") {
    var calls = 0
    intercept[IllegalArgumentException](
      Retry.withRetries(5, scala.concurrent.duration.Duration.Zero, _ => ()) {
        calls += 1; throw new IllegalArgumentException("bug")
      })
    assert(calls == 1)
  }
}
