package graft.queries

/** The reference's own ts_parse('default', ...) vectors — inputs from
  * `/root/reference/src/test/regress/sql/tsearch.sql` and expected
  * token streams transcribed from `expected/tsearch.out` (NOT derived
  * from our parser — this is the independent oracle both
  * FtsParserSpec and the t_fts_parser DuckDB oracle consume). */
object TsParserRegress {

  /** The big 139-token regress string (ts_parse section). */
  val big: String =
    "345 qwe@efd.r ' http://www.com/ http://aew.werc.ewr/?ad=qwe&dw " +
    "1aew.werc.ewr/?ad=qwe&dw 2aew.werc.ewr http://3aew.werc.ewr/?ad=qwe&dw " +
    "http://4aew.werc.ewr http://5aew.werc.ewr:8100/?  ad=qwe&dw " +
    "6aew.werc.ewr:8100/?ad=qwe&dw 7aew.werc.ewr:8100/?ad=qwe&dw=%20%32 " +
    "+4.0e-10 qwe qwe qwqwe 234.435 455 5.005 teodor@stack.net " +
    "teodor@123-stack.net 123_teodor@stack.net 123-teodor@stack.net " +
    "qwe-wer asdf <fr>qwer jf sdjk<we hjwer <werrwe> ewr1> ewri2 " +
    "<a href=\"qwe<qwe>\">\n" +
    "/usr/local/fff /awdf/dwqe/4325 rewt/ewr wefjn /wqe-324/ewr gist.h " +
    "gist.h.c gist.c. readline 4.2 4.2. 4.2, readline-4.2 readline-4.2. 234\n" +
    "<i <b> wow  < jqw <> qwerty"

  val bigExpected: Seq[(Int, String)] = Seq(
    22 -> "345", 12 -> " ", 1 -> "qwe", 12 -> "@", 19 -> "efd.r",
    12 -> " ' ", 14 -> "http://", 6 -> "www.com", 12 -> "/ ",
    14 -> "http://", 5 -> "aew.werc.ewr/?ad=qwe&dw", 6 -> "aew.werc.ewr",
    18 -> "/?ad=qwe&dw", 12 -> " ", 5 -> "1aew.werc.ewr/?ad=qwe&dw",
    6 -> "1aew.werc.ewr", 18 -> "/?ad=qwe&dw", 12 -> " ",
    6 -> "2aew.werc.ewr", 12 -> " ", 14 -> "http://",
    5 -> "3aew.werc.ewr/?ad=qwe&dw", 6 -> "3aew.werc.ewr",
    18 -> "/?ad=qwe&dw", 12 -> " ", 14 -> "http://", 6 -> "4aew.werc.ewr",
    12 -> " ", 14 -> "http://", 5 -> "5aew.werc.ewr:8100/?",
    6 -> "5aew.werc.ewr:8100", 18 -> "/?", 12 -> "  ", 1 -> "ad",
    12 -> "=", 1 -> "qwe", 12 -> "&", 1 -> "dw", 12 -> " ",
    5 -> "6aew.werc.ewr:8100/?ad=qwe&dw", 6 -> "6aew.werc.ewr:8100",
    18 -> "/?ad=qwe&dw", 12 -> " ",
    5 -> "7aew.werc.ewr:8100/?ad=qwe&dw=%20%32", 6 -> "7aew.werc.ewr:8100",
    18 -> "/?ad=qwe&dw=%20%32", 12 -> " ", 7 -> "+4.0e-10", 12 -> " ",
    1 -> "qwe", 12 -> " ", 1 -> "qwe", 12 -> " ", 1 -> "qwqwe", 12 -> " ",
    20 -> "234.435", 12 -> " ", 22 -> "455", 12 -> " ", 20 -> "5.005",
    12 -> " ", 4 -> "teodor@stack.net", 12 -> " ",
    4 -> "teodor@123-stack.net", 12 -> " ", 4 -> "123_teodor@stack.net",
    12 -> " ", 4 -> "123-teodor@stack.net", 12 -> " ", 16 -> "qwe-wer",
    11 -> "qwe", 12 -> "-", 11 -> "wer", 12 -> " ", 1 -> "asdf", 12 -> " ",
    13 -> "<fr>", 1 -> "qwer", 12 -> " ", 1 -> "jf", 12 -> " ",
    1 -> "sdjk", 12 -> "<", 1 -> "we", 12 -> " ", 1 -> "hjwer", 12 -> " ",
    13 -> "<werrwe>", 12 -> " ", 3 -> "ewr1", 12 -> "> ", 3 -> "ewri2",
    12 -> " ", 13 -> "<a href=\"qwe<qwe>\">", 12 -> "\n",
    19 -> "/usr/local/fff", 12 -> " ", 19 -> "/awdf/dwqe/4325", 12 -> " ",
    19 -> "rewt/ewr", 12 -> " ", 1 -> "wefjn", 12 -> " ",
    19 -> "/wqe-324/ewr", 12 -> " ", 19 -> "gist.h", 12 -> " ",
    19 -> "gist.h.c", 12 -> " ", 19 -> "gist.c", 12 -> ". ",
    1 -> "readline", 12 -> " ", 20 -> "4.2", 12 -> " ", 20 -> "4.2",
    12 -> ". ", 20 -> "4.2", 12 -> ", ", 1 -> "readline", 20 -> "-4.2",
    12 -> " ", 1 -> "readline", 20 -> "-4.2", 12 -> ". ", 22 -> "234",
    12 -> "\n", 12 -> "<", 1 -> "i", 12 -> " ", 13 -> "<b>", 12 -> " ",
    1 -> "wow", 12 -> "  ", 12 -> "< ", 1 -> "jqw", 12 -> " ",
    12 -> "<> ", 1 -> "qwerty")

  /** ts_debug URL examples. */
  val url1 = "http://www.harewoodsolutions.co.uk/press.aspx</span>"
  val url1Expected: Seq[(Int, String)] = Seq(
    14 -> "http://", 5 -> "www.harewoodsolutions.co.uk/press.aspx",
    6 -> "www.harewoodsolutions.co.uk", 18 -> "/press.aspx",
    13 -> "</span>")

  val url2 = "http://aew.wer0c.ewr/id?ad=qwe&dw<span>"
  val url2Expected: Seq[(Int, String)] = Seq(
    14 -> "http://", 5 -> "aew.wer0c.ewr/id?ad=qwe&dw",
    6 -> "aew.wer0c.ewr", 18 -> "/id?ad=qwe&dw", 13 -> "<span>")

  /** ts_debug tag/entity example. */
  val entity = "<myns:foo-bar_baz.blurfl>abc&nm1;def&#xa9;ghi&#245;jkl" +
    "</myns:foo-bar_baz.blurfl>"
  val entityExpected: Seq[(Int, String)] = Seq(
    13 -> "<myns:foo-bar_baz.blurfl>", 1 -> "abc", 23 -> "&nm1;",
    1 -> "def", 23 -> "&#xa9;", 1 -> "ghi", 23 -> "&#245;", 1 -> "jkl",
    13 -> "</myns:foo-bar_baz.blurfl>")

  /** (vec_id, input, expected tokens) for the driver query + oracle. */
  val vectors: Seq[(Int, String, Seq[(Int, String)])] = Seq(
    (1, big, bigExpected), (2, url1, url1Expected),
    (3, url2, url2Expected), (4, entity, entityExpected))
}
