package graft

import java.nio.file.{Files, Path}
import java.nio.charset.StandardCharsets

/** Synthesizes the movie-like CSV fixture described in FIXTURES.md §A:
  * 14 pipeline columns + 2 extra (projection must drop them), with
  * duplicate ids, nulls in every null-drop column, "[]" and malformed
  * JSON keywords, a multiline quoted field, leading whitespace and
  * quoted commas. Three well-separated "franchises" provide the
  * seeded-LSH neighbor property (SURVEY.md §5.3).
  */
object MovieFixture {

  val header: String =
    "id,title,revenue,budget,overview,poster_path,production_companies," +
      "release_year,Director,Star1,Star2,Star3,genres_list,all_combined_keywords," +
      "extra_col_a,extra_col_b"

  private def q(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""

  private def row(id: String, title: String, overview: String, poster: String,
      companies: String, year: String, director: String,
      s1: String, s2: String, s3: String,
      genres: String, keywords: String): String =
    Seq(id, q(title), "1000000", "500000", q(overview), poster, q(companies),
      year, q(director), s1, s2, s3, q(genres), q(keywords), "x", "y")
      .mkString(",")

  /** A themed group of `n` movies sharing overview/keyword/cast tokens. */
  private def group(baseId: Int, n: Int, theme: String, words: Seq[String],
      director: String, stars: Seq[String], genres: String,
      keywords: Seq[String]): Seq[String] =
    (0 until n).map { i =>
      row(
        id = (baseId + i).toString,
        title = s"$theme Chapter ${i + 1}",
        overview = words.mkString(" ") + s", the saga part ${i + 1}",
        poster = s"/p/$theme$i.jpg",
        companies = s"$theme Studios",
        year = (2000 + i).toString + ".0",
        director = director,
        s1 = stars(0), s2 = stars(1), s3 = stars(2),
        genres = genres,
        keywords = "['" + keywords.mkString("', '") + "']")
    }

  /** Franchise ids: wizard 671-674, space 801-808, romance 901-908. */
  val wizardIds: Seq[Int] = Seq(671, 672, 673, 674)

  def lines: Seq[String] = {
    val wizard = group(671, 4, "Wizard School",
      words = Seq("young wizard discovers magic castle"),
      director = "Chris Columbus",
      stars = Seq("DanielR", "EmmaW", "RupertG"),
      genres = "['Fantasy', 'Adventure']",
      keywords = Seq("wizard school", "magic wand", "spell casting"))
    val space = group(801, 8, "Star Voyage",
      words = Seq("starship crew explores galaxy nebula"),
      director = "Ridley Scott",
      stars = Seq("SigourneyW", "TomS", "ZoeS"),
      genres = "['SciFi', 'Thriller']",
      keywords = Seq("space travel", "alien planet", "warp drive"))
    val romance = group(901, 8, "Paris Heart",
      words = Seq("lovers meet rainy boulevard cafe"),
      director = "Nora Ephron",
      stars = Seq("MegR", "TomH", "CarrieF"),
      genres = "['Romance', 'Drama']",
      keywords = Seq("true love", "second chance", "letter writing"))

    val quirks = Seq(
      // duplicate id 671, identical content except the extra columns
      // (dedup keeps an arbitrary one — both must be equivalent)
      wizard.head.stripSuffix("x,y") + "x2,y2",
      // null title → dropped by na.drop
      "90,,1,1,no title here,/p/x1.jpg,S,2001.0,D,B1,B2,B3,\"['Drama']\",\"['kw one']\",x,y",
      // null release_year → dropped
      row("91", "No Year", "overview ok", "/p/x2.jpg", "S", "", "D", "B1", "B2", "B3",
        "['Drama']", "['kw one']"),
      // null overview → dropped
      "92,No Overview,1,1,,/p/x3.jpg,S,2001.0,D,B1,B2,B3,\"['Drama']\",\"['kw one']\",x,y",
      // null poster_path → dropped
      "93,No Poster,1,1,some overview,,S,2001.0,D,B1,B2,B3,\"['Drama']\",\"['kw one']\",x,y",
      // null keywords → dropped
      "94,No Keywords,1,1,some overview,/p/x4.jpg,S,2001.0,D,B1,B2,B3,\"['Drama']\",,x,y",
      // "[]" keywords → filtered (P5)
      "95,Empty Keywords,1,1,some overview,/p/x5.jpg,S,2001.0,D,B1,B2,B3,\"['Drama']\",[],x,y",
      // malformed keywords JSON → from_json null → second-phase drop
      "96,Broken Keywords,1,1,some overview,/p/x6.jpg,S,2001.0,D,B1,B2,B3,\"['Drama']\",not-json,x,y",
      // null companies + stars → sentinel-filled with "a", SURVIVES
      "97,Sentinel Movie,1,1,\"orphan overview, with comma\",/p/x7.jpg,,2001.0,D,,,," +
        "\"['Drama']\",\"['lonely keyword']\",x,y",
      // multiline quoted overview + leading whitespace, SURVIVES
      "  98,  Multiline Movie  ,1,1,\"first line\nsecond line, of overview\",/p/x8.jpg," +
        "S,2001.0,D,C1,C2,C3,\"['Drama']\",\"['multi line']\",x,y")

    wizard ++ space ++ romance ++ quirks
  }

  /** Rows surviving clean: 4+8+8 themed (one of the two id-671 rows) +
    * sentinel (97) + multiline (98) = 22. After from_json second drop
    * (row 96 already null-dropped earlier — its keywords parse fails →
    * dropped in featurize): still 22 here because 96 is malformed, not
    * null, at clean time → 23 after clean, 22 after featurize. */
  val expectedAfterClean: Long = 23
  val expectedAfterFeaturize: Long = 22

  def write(dir: Path): String = {
    val f = dir.resolve("movies.csv")
    Files.write(f, (header +: lines).mkString("\n").getBytes(StandardCharsets.UTF_8))
    f.toString
  }
}
