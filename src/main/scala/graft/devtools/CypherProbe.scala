package graft.devtools

import org.apache.spark.sql.functions._

/** Dev-only gap finder for the Cypher front-end: runs a battery of
  * realistic free-form Cypher strings (the kinds of queries the
  * reference's arbitrary-Cypher API promises) against a tiny in-memory
  * graph and prints PASS/FAIL per query — FAILs are the front-end's
  * actual parity frontier, candidates for the next feature.
  *
  * Usage: tools/run.sh graft.devtools.CypherProbe
  */
object CypherProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(4, "cypher-probe")
    import spark.implicits._
    val nodes = Seq(
      ("WasteItem", "u:w1", "Bauschutt", null.asInstanceOf[String]),
      ("WasteItem", "u:w2", "Asche", null.asInstanceOf[String]),
      ("WasteStream", "u:s1", "Restmuell", null.asInstanceOf[String]),
      ("Facility", "u:f1", "Wertstoffhof A", "Campusallee 1"))
      .toDF("label", "uid", "name", "address")
    val edges = Seq(
      ("u:w1", "DISPOSED_IN", "u:s1"),
      ("u:w2", "DISPOSED_IN", "u:s1"),
      ("u:w1", "DISPOSED_AT", "u:f1"))
      .toDF("src_uid", "rel_type", "dst_uid")

    val battery: Seq[(String, String)] = Seq(
      "collect"        -> "MATCH (w:WasteItem) RETURN collect(w.name) AS names",
      "collect+distinct" -> "MATCH (w:WasteItem)-[:DISPOSED_IN]->(s) RETURN s.name AS s, collect(DISTINCT w.name) AS ws",
      "size(collect)"  -> "MATCH (w:WasteItem) RETURN size(collect(w.name)) AS n",
      "coalesce"       -> "MATCH (n:Facility) RETURN coalesce(n.address, 'unknown') AS addr",
      "exists prop"    -> "MATCH (n) WHERE n.address IS NOT NULL RETURN n.name AS name",
      "starts with"    -> "MATCH (n) WHERE n.name STARTS WITH 'Wert' RETURN n.name AS name",
      "ends with"      -> "MATCH (n) WHERE n.name ENDS WITH 'muell' RETURN n.name AS name",
      "contains"       -> "MATCH (n) WHERE n.name CONTAINS 'schutt' RETURN n.name AS name",
      "regex"          -> "MATCH (n) WHERE n.name =~ 'A.*' RETURN n.name AS name",
      "in list"        -> "MATCH (n) WHERE n.name IN ['Asche', 'Laub'] RETURN n.name AS name",
      "toLower"        -> "MATCH (n:WasteItem) RETURN toLower(n.name) AS lname",
      "toUpper"        -> "MATCH (n:WasteItem) RETURN toUpper(n.name) AS uname",
      "trim/replace"   -> "MATCH (n:WasteItem) RETURN replace(trim(n.name), 'sch', 'S') AS r",
      "substring"      -> "MATCH (n:WasteItem) RETURN substring(n.name, 0, 3) AS pre",
      "split"          -> "MATCH (f:Facility) RETURN split(f.name, ' ')[1] AS tok",
      "toString/toInteger" -> "MATCH (n:WasteItem) RETURN toInteger('42') + size(n.name) AS x",
      "CASE"           -> "MATCH (n) RETURN CASE WHEN n.address IS NULL THEN 'no' ELSE 'yes' END AS has, count(*) AS c",
      "avg/min/max"    -> "MATCH (n) RETURN avg(size(n.name)) AS a, min(n.name) AS mn, max(n.name) AS mx",
      "sum"            -> "MATCH (n) RETURN sum(size(n.name)) AS total",
      "count distinct" -> "MATCH (w)-[:DISPOSED_IN]->(s) RETURN count(DISTINCT s.name) AS n",
      "optional+agg"   -> "MATCH (w:WasteItem) OPTIONAL MATCH (w)-[:DISPOSED_AT]->(f) RETURN w.name AS w, count(f) AS nf",
      "with agg chain" -> "MATCH (w)-[:DISPOSED_IN]->(s) WITH s, count(w) AS n WHERE n > 1 RETURN s.name AS name, n",
      "unwind literal" -> "UNWIND [1,2,3] AS x RETURN x, x*2 AS y",
      "varlen 1..2"    -> "MATCH (w:WasteItem)-[*1..2]->(x) RETURN w.name AS w, x.name AS x",
      "not exists pat" -> "MATCH (w:WasteItem) WHERE NOT (w)-[:DISPOSED_IN]->() RETURN w.name AS name",
      "exists pattern" -> "MATCH (w:WasteItem) WHERE (w)-[:DISPOSED_AT]->() RETURN w.name AS name",
      "multi rel types" -> "MATCH (w)-[r:DISPOSED_IN|DISPOSED_AT]->(x) RETURN w.name AS w, type(r) AS t, x.name AS x",
      "named path len" -> "MATCH p = (w:WasteItem)-[*1..2]->(x) RETURN w.name AS w, length(p) AS len",
      "distinct rows"  -> "MATCH (w)-[:DISPOSED_IN]->(s) RETURN DISTINCT s.name AS name",
      "order skip limit" -> "MATCH (n) RETURN n.name AS name ORDER BY name SKIP 1 LIMIT 2",
      "id()"           -> "MATCH (n) RETURN id(n) AS i LIMIT 1",
      "properties()"   -> "MATCH (n:Facility) RETURN properties(n) AS p",
      "keys()"         -> "MATCH (n:Facility) RETURN keys(n) AS ks",
      "list compreh"   -> "MATCH (w:WasteItem) RETURN [x IN split(w.name, 'a') | toUpper(x)] AS parts",
      "reduce"         -> "MATCH (w:WasteItem) RETURN reduce(acc = 0, x IN [1,2,3] | acc + x) AS r",
      "range()"        -> "UNWIND range(1, 3) AS i RETURN i",
      "count(*) group" -> "MATCH (n) RETURN n.label AS l, count(*) AS c",
      "param compare"  -> "MATCH (n) WHERE n.name = $name RETURN n.uid AS uid",
      "xor"            -> "MATCH (n) WHERE n.name = 'Asche' XOR n.name = 'Laub' RETURN n.name AS name",
      "null prop out"  -> "MATCH (n:WasteItem) RETURN n.address AS addr LIMIT 1",
      // frontier hunt, round 6 closing: harder openCypher shapes
      "shortestPath"   -> "MATCH p = shortestPath((w:WasteItem)-[*..3]->(f:Facility)) RETURN w.name AS w, length(p) AS len",
      "case in where"  -> "MATCH (n) WHERE (CASE WHEN n.address IS NULL THEN 0 ELSE 1 END) = 1 RETURN n.name AS name",
      "with orderby limit then match" -> "MATCH (w:WasteItem) WITH w ORDER BY w.name LIMIT 1 MATCH (w)-[:DISPOSED_IN]->(s) RETURN s.name AS s",
      "exists subquery" -> "MATCH (w:WasteItem) WHERE EXISTS { MATCH (w)-[:DISPOSED_AT]->(:Facility) } RETURN w.name AS name",
      "call subquery"  -> "CALL { MATCH (n:WasteItem) RETURN n.name AS name } RETURN name ORDER BY name",
      "map projection" -> "MATCH (f:Facility) RETURN f {.name, .address} AS m",
      "label pred in where" -> "MATCH (n) WHERE n:WasteItem RETURN n.name AS name",
      "type(r) in list" -> "MATCH ()-[r]->() WHERE type(r) IN ['DISPOSED_AT'] RETURN count(r) AS n",
      "arith mod pow"  -> "UNWIND range(1, 5) AS i RETURN i % 2 AS m, i ^ 2 AS sq",
      "order by agg alias" -> "MATCH (w)-[:DISPOSED_IN]->(s) RETURN s.name AS s, count(w) AS n ORDER BY n DESC, s",
      "unwind with agg" -> "UNWIND [1,2,2,3] AS x WITH x, count(*) AS c WHERE c > 1 RETURN x, c",
      "nested list index" -> "MATCH (w:WasteItem) RETURN split(w.name, 'a')[0] AS first, last(split(w.name, 'a')) AS lst",
      "all/any predicate" -> "MATCH (w:WasteItem) WHERE all(x IN [1,2] WHERE x > 0) AND any(y IN [0,1] WHERE y = 1) RETURN w.name AS name",
      "none/single"    -> "MATCH (w:WasteItem) WHERE none(x IN [1] WHERE x < 0) AND single(y IN [1,2] WHERE y = 2) RETURN w.name AS name",
      "optional match where" -> "MATCH (w:WasteItem) OPTIONAL MATCH (w)-[:DISPOSED_AT]->(f) WHERE f.name CONTAINS 'hof' RETURN w.name AS w, f.name AS f",
      "null order asc"  -> "MATCH (n) RETURN n.address AS a ORDER BY a LIMIT 2",
      "string concat +" -> "MATCH (n:Facility) RETURN n.name + '!' AS x, 'k=' + n.name AS y, n.name + 1 AS z",
      "list concat +"   -> "UNWIND [0] AS z RETURN [1] + [2, 3] AS a, [1] + 2 AS b",
      "pattern compreh" -> "MATCH (s:WasteStream) RETURN s.name AS s, [(w:WasteItem)-[:DISPOSED_IN]->(s) | w.name] AS ws",
      "pattern compreh WHERE" -> "MATCH (s:WasteStream) RETURN [(w)-[:DISPOSED_IN]->(s) WHERE w.name STARTS WITH 'A' | w.name] AS ws",
      "stDev/stDevP"    -> "UNWIND [1, 2, 3, 4] AS x RETURN stDev(x) AS sd, stDevP(x) AS sdp",
      "percentileCont/Disc" -> "UNWIND [1, 2, 3, 4] AS x RETURN percentileCont(x, 0.5) AS pc, percentileDisc(x, 0.5) AS pd",
      "exists(prop)"    -> "MATCH (n) WHERE exists(n.address) RETURN count(*) AS c",
      "bare bool alias" -> "MATCH (n) WITH n, exists(n.address) AS has WHERE has RETURN count(*) AS c",
      "toBoolean"       -> "UNWIND [0] AS z RETURN toBoolean('true') AS t",
      "list slice"      -> "UNWIND [0] AS z RETURN [1,2,3,4][1..3] AS m, [1,2,3][..2] AS h, [1,2,3][-1..] AS t",
      "map literal"     -> "MATCH (f:Facility) RETURN {name: f.name, k: 1} AS m LIMIT 1",
      "nodes/rels of p" -> "MATCH p = (w:WasteItem)-[:DISPOSED_IN]->(s) RETURN [x IN nodes(p) | x.label] AS ls, size(relationships(p)) AS nr",
      "RETURN *"        -> "MATCH (w:WasteItem) RETURN *",
      "WITH *"          -> "MATCH (w:WasteItem) WITH * MATCH (w)-[:DISPOSED_IN]->(s) RETURN s.name AS s",
      "labels(n) full"  -> "MATCH (n:Facility) RETURN labels(n) AS ls",
      "reverse"         -> "MATCH (n:Facility) RETURN reverse(n.name) AS r, reverse([1,2]) AS rl",
      "bound-target pattern" -> "MATCH (w:WasteItem) MATCH (s:WasteStream) WHERE NOT (w)-[:DISPOSED_IN]->(s) RETURN count(*) AS c",
      "properties(r)"   -> "MATCH ()-[r]->() RETURN properties(r) AS p LIMIT 1",
      "chained cmp"     -> "UNWIND [1,2,3] AS x WITH x WHERE 1 < x <= 2 RETURN x",
      "varlen pattern pred" -> "MATCH (w:WasteItem) WHERE (w)-[*1..2]->(:Facility) RETURN w.name AS n",
      "multi-hop bare pred" -> "MATCH (w:WasteItem) WHERE NOT (w)-[:DISPOSED_IN]->()-[:FEEDS]->() RETURN count(*) AS c",
      "varlen prop map"  -> "MATCH (w:WasteItem)-[r*1..2 {rel_type: 'DISPOSED_IN'}]->(t) RETURN w.name AS w, size(r) AS k",
      "exists() value"   -> "MATCH (w:WasteItem) RETURN exists((w)-[:DISPOSED_IN]->()) AS d, count(*) AS n",
      "EXISTS{} CASE result" -> "MATCH (w:WasteItem) RETURN CASE WHEN w.name STARTS WITH 'A' THEN EXISTS { (w)-[:DISPOSED_IN]->(:WasteStream) } ELSE false END AS f",
      "percentile $param" -> "MATCH (n:WasteItem) RETURN percentileCont(size(n.name), $p) AS p50",
      "WITH * path len"  -> "MATCH p = (w:WasteItem)-[:DISPOSED_IN]->(s) WITH * RETURN w.name AS n, length(p) AS len")

    var pass = 0
    battery.foreach { case (tag, q) =>
      try {
        graft.graph.CypherFrontend.run(q, nodes, edges,
          Map("name" -> "Asche", "p" -> 0.5)).collect()
        println(f"[probe] PASS $tag%-18s")
        pass += 1
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
            .linesIterator.next().take(100)
          println(f"[probe] FAIL $tag%-18s $msg")
      }
    }
    println(s"[probe] $pass/${battery.size} pass")
    spark.stop()
  }
}
