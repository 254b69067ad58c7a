package graft.textkit

import org.scalatest.funsuite.AnyFunSuite

/** Direct cascade-order tests for the HTML extractors (F1-F7) — the
  * selector priorities the reference walks (parse_jobs.py:50-299),
  * exercised without the full Parse stage. The reference uses
  * BeautifulSoup; these pin our regex cascade's ORDER and guards on
  * markup where the approximation must agree. */
class HtmlExtractSpec extends AnyFunSuite {

  test("title cascade prefers h1.job-title over later selectors") {
    val html = """<html><head><title>Portal - Jobs</title></head><body>
      <div class="offer-title">Wrong: picked too early</div>
      <h1 class="job-title">Data Engineer Abidjan</h1></body></html>"""
    assert(HtmlExtract.extractTitle(html) == "Data Engineer Abidjan")
  }

  test("descendant step: h1 inside .job-title container wins over .offer-title") {
    val html = """<div class="job-title"><h1>Chef de Projet SI</h1></div>
      <div class="offer-title">Later selector</div>"""
    assert(HtmlExtract.extractTitle(html) == "Chef de Projet SI")
  }

  test("length guard checks only the FIRST element per selector (reference quirk)") {
    // The reference takes elements[0] of each selector: a too-short
    // first h1 exhausts every selector that matches it (h1, [class*=
    // title], [class*=job]) and a LATER, longer h1 is never consulted —
    // parse_jobs.py:55-61. Preserved bug-compatibly.
    val html = """<h1 class="job-title">Dev</h1><h1>Ingénieur Logiciel Senior</h1>"""
    assert(HtmlExtract.extractTitle(html) == null)
    // fall-through across DIFFERENT selectors does work: the short h1
    // fails, a div.offer-title (not matched by earlier selectors) wins
    val html2 = """<h1>Dev</h1><div class="offer-title">Ingénieur Logiciel</div>"""
    assert(HtmlExtract.extractTitle(html2) == "Ingénieur Logiciel")
  }

  test("page <title> is the last fallback; null when nothing qualifies") {
    assert(HtmlExtract.extractTitle(
      "<html><head><title>Emplois en Côte d'Ivoire</title></head></html>")
      == "Emplois en Côte d'Ivoire")
    assert(HtmlExtract.extractTitle("<p>rien</p>") == null)
    assert(HtmlExtract.extractTitle(null) == null)
    assert(HtmlExtract.extractTitle("") == null)
  }

  test("script/style/tag stripping collapses to clean inner text") {
    val html = """<h1>Analyste  <b>Données</b><script>var x=1;</script>
      <style>h1{}</style> Senior</h1>"""
    assert(HtmlExtract.extractTitle(html) == "Analyste Données Senior")
  }

  test("company default applies only after selectors AND text patterns miss") {
    assert(HtmlExtract.extractCompany("<p>aucun employeur mentionné ici</p>")
      == "Entreprise confidentielle")
    assert(HtmlExtract.extractCompany(
      """<div class="company-name">Orange CI</div>""") == "Orange CI")
  }
}
