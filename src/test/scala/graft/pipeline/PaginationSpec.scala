package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors /root/reference/tests/unit/test_pagination.py:1-11. */
class PaginationSpec extends AnyFunSuite {
  import Bronze.Pagination.parseLastPage

  test("happy path: rel=last with page number") {
    val h = """<https://api.example.com/v1/breweries?per_page=200&page=2>; rel="next", """ +
      """<https://api.example.com/v1/breweries?per_page=200&page=17>; rel="last""""
    assert(parseLastPage(Some(h)) === Some(17))
  }

  test("missing header → None") {
    assert(parseLastPage(None) === None)
  }

  test("malformed header (no rel=last) → None") {
    assert(parseLastPage(Some("""<https://x>; rel="next"""")) === None)
  }

  test("rel=last without a page param → None") {
    assert(parseLastPage(Some("""<https://x/no-page>; rel="last"""")) === None)
  }

  test("page param can come after & mid-query") {
    val h = """<https://x?a=1&page=42&b=2>; rel="last""""
    assert(parseLastPage(Some(h)) === Some(42))
  }
}
