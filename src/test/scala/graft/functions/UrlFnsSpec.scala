package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlFnsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlFns.canonicalize(col("url"))).as[String]
      .collect().toSeq

  test("case, default ports, trailing slash and utm params all collapse") {
    val variants = Seq(
      "HTTP://Example.COM:80/a/b/?utm_source=x&id=1",
      "http://example.com/a/b?id=1",
      "http://EXAMPLE.com:80/a/b/?id=1&utm_campaign=z")
    assert(canon(variants: _*).distinct == Seq("http://example.com/a/b?id=1"))
  }

  test("non-default port, param order and fragment-free query survive") {
    assert(canon("https://h.io:8443/p?b=2&a=1")
      == Seq("https://h.io:8443/p?a=1&b=2"))
    // 443 is https' default and drops; 80 on https is NOT default
    assert(canon("https://h.io:443/p") == Seq("https://h.io/p"))
    assert(canon("https://h.io:80/p") == Seq("https://h.io:80/p"))
  }

  test("bare host, empty query and malformed urls stay stable") {
    assert(canon("http://Host.io") == Seq("http://host.io"))
    assert(canon("http://h.io/p?utm_only=1") == Seq("http://h.io/p"))
    assert(canon("not a url") == Seq("not a url"))
  }
}
