package graft.functions

import graft.functions.Geometry._
import scala.collection.mutable.ArrayBuffer

/** General polygon overlay — intersection / union / difference over
  * simple single-ring polygons, convex or NOT — via Greiner–Hormann
  * traversal (Greiner & Hormann, ACM TOG 17(2), 1998) restricted to
  * PROPER edge crossings. This closes the main refusal the convex
  * Sutherland–Hodgman path (`Geometry.intersectionWithConvex`) left
  * open; the reference gets the same surface from GEOS
  * (pg_lake_engine/src/pgduck/shippable_spatial_functions.c).
  *
  * Domain contract (refused loudly, never silently wrong):
  *  - inputs are valid single-ring polygons (holes stay on the convex
  *    path or the exactly-decidable difference subset);
  *  - degenerate boundary contact — a vertex of one polygon exactly on
  *    the other's boundary, collinear overlapping edges, or a computed
  *    crossing collapsing onto a vertex — is refused: correct handling
  *    needs snap-rounded exact arithmetic, and a wrong polygon is worse
  *    than a loud error. Generic-position inputs (e.g. integer
  *    coordinates against half-integer coordinates) never hit this.
  *
  * All predicates (crossing detection, entry/exit marking) are sign
  * tests on exact products; the only constructions are the crossing
  * points themselves (one division each, like `st_shortestline`).
  *
  * No-crossing configurations (containment / disjoint) are decided by
  * point location and returned in closed form, so
  * `union(A,B) = B when A ⊆ B`, `difference(A,B) = A-with-hole-B when
  * B ⊂ A`, etc., all still work on non-convex shapes.
  */
object Overlay {

  sealed trait Op {
    def name: String
    /** Flag inversions select the traversal: (false,false) =
      * intersection, (true,true) = union, (true,false) = A minus B —
      * the Greiner–Hormann complement trick.
      */
    def invSubject: Boolean
    def invClip: Boolean
  }
  case object Inter extends Op {
    val name = "st_intersection"; val invSubject = false; val invClip = false
  }
  case object Union extends Op {
    val name = "st_union"; val invSubject = true; val invClip = true
  }
  case object Diff extends Op {
    val name = "st_difference"; val invSubject = true; val invClip = false
  }

  private final class Node(val p: Pt, val isInter: Boolean) {
    var next: Node = _
    var prev: Node = _
    var neighbor: Node = _
    var entry: Boolean = false
    var visited: Boolean = false
  }

  @inline private def cross(a: Pt, b: Pt, p: Pt): Double =
    (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)

  private def signedArea(open: IndexedSeq[Pt]): Double = {
    var s = 0.0; var i = 0; val n = open.length
    while (i < n) {
      val a = open(i); val b = open((i + 1) % n)
      s += a.x * b.y - b.x * a.y
      i += 1
    }
    s / 2.0
  }

  private def openRing(r: IndexedSeq[Pt]): IndexedSeq[Pt] =
    if (r.length > 1 && r.head == r.last) r.dropRight(1) else r

  private def ccw(open: IndexedSeq[Pt]): IndexedSeq[Pt] =
    if (signedArea(open) >= 0) open else open.reverse

  private def refuse(op: String, why: String): Nothing =
    throw new UnsupportedOperationException(
      s"$op: $why — the exact overlay refuses degenerate contact " +
        "rather than emit a possibly-wrong polygon (perturb inputs or " +
        "use a convex clipper)")

  /** Entry point: general overlay of two single-ring polygons. */
  def overlayPolygons(ga: Geom, gb: Geom, op: Op): Geom = {
    val srid = ga.srid
    val (ra, rb) = (ga, gb) match {
      case (GPolygon(as, _), GPolygon(bs, _))
          if as.length == 1 && bs.length == 1 => (as.head, bs.head)
      case _ => throw new UnsupportedOperationException(
        s"${op.name}: general overlay supports single-ring polygons " +
          s"(got ${geometryType(ga)}, ${geometryType(gb)})")
    }
    require(isValid(ga) && isValid(gb),
      s"${op.name}: inputs must be valid polygons")
    trace(ra, rb, op) match {
      case None => // no proper crossings: containment or disjoint
        val aInB = locateInRing(rb, ra.head) == 2
        val bInA = locateInRing(ra, rb.head) == 2
        op match {
          case Inter =>
            if (aInB) ga
            else if (bInA) gb.withSrid(srid)
            else GPolygon(Vector.empty, srid)
          case Union =>
            if (aInB) gb.withSrid(srid)
            else if (bInA) ga
            else GMultiPolygon(Vector(Vector(ra), Vector(rb)), srid)
          case Diff =>
            if (aInB) GPolygon(Vector.empty, srid)
            else if (bInA) GPolygon(Vector(ra, rb), srid) // hole
            else ga
        }
      case Some(raw) =>
        val rings = raw.map(closeDedupe).filter(r =>
          r.length >= 4 && signedArea(openRing(r)) != 0.0)
        op match {
          case Union =>
            if (rings.isEmpty)
              refuse(op.name, "union traversal produced no area")
            // union of two overlapping simple polygons is connected:
            // the largest ring is the shell, the rest are holes
            val shell = rings.maxBy(r => math.abs(signedArea(openRing(r))))
            GPolygon(shell +: rings.filterNot(_ eq shell), srid)
          case _ =>
            if (rings.isEmpty) GPolygon(Vector.empty, srid)
            else if (rings.length == 1) GPolygon(Vector(rings.head), srid)
            else GMultiPolygon(rings.map(r => Vector(r)), srid)
        }
    }
  }

  private def closeDedupe(r: IndexedSeq[Pt]): IndexedSeq[Pt] = {
    val d = r.foldLeft(Vector.empty[Pt]) { (acc, p) =>
      if (acc.nonEmpty && acc.last == p) acc else acc :+ p
    }
    val open = if (d.length > 1 && d.head == d.last) d.dropRight(1) else d
    if (open.isEmpty) open else open :+ open.head
  }

  /** Core Greiner–Hormann: None when the boundaries have no proper
    * crossing; otherwise the traversed result rings (closed).
    */
  private def trace(ringA: IndexedSeq[Pt], ringB: IndexedSeq[Pt],
      op: Op): Option[IndexedSeq[IndexedSeq[Pt]]] = {
    val a = ccw(openRing(ringA))
    val b = ccw(openRing(ringB))
    val closedA = a :+ a.head
    val closedB = b :+ b.head
    if (a.exists(p => locateInRing(closedB, p) == 1) ||
        b.exists(p => locateInRing(closedA, p) == 1))
      refuse(op.name,
        "a vertex lies exactly on the other polygon's boundary")

    val na = a.length; val nb = b.length
    val onA = Array.fill(na)(ArrayBuffer.empty[(Double, Node)])
    val onB = Array.fill(nb)(ArrayBuffer.empty[(Double, Node)])
    var count = 0
    var i = 0
    while (i < na) {
      val p = a(i); val q = a((i + 1) % na)
      var j = 0
      while (j < nb) {
        val c = b(j); val d = b((j + 1) % nb)
        val d1 = cross(c, d, p); val d2 = cross(c, d, q)
        val d3 = cross(p, q, c); val d4 = cross(p, q, d)
        // proper crossing: strict sign changes on both segments. A
        // zero determinant means an endpoint on the other edge's LINE;
        // on the edge itself it was refused above, off the edge the
        // pair cannot cross.
        if (d1 != 0 && d2 != 0 && d3 != 0 && d4 != 0 &&
            (d1 > 0) != (d2 > 0) && (d3 > 0) != (d4 > 0)) {
          val tA = d1 / (d1 - d2)
          val tB = d3 / (d3 - d4)
          val x = Pt(p.x + tA * (q.x - p.x), p.y + tA * (q.y - p.y))
          if (tA <= 0 || tA >= 1 || tB <= 0 || tB >= 1 ||
              x == p || x == q || x == c || x == d)
            refuse(op.name, "a crossing collapses onto a vertex")
          val an = new Node(x, true); val bn = new Node(x, true)
          an.neighbor = bn; bn.neighbor = an
          onA(i) += ((tA, an)); onB(j) += ((tB, bn))
          count += 1
        }
        j += 1
      }
      i += 1
    }
    if (count == 0) return None
    if (count % 2 != 0)
      refuse(op.name, "odd crossing count (numerically inconsistent input)")

    def link(verts: IndexedSeq[Pt],
        lists: Array[ArrayBuffer[(Double, Node)]]): IndexedSeq[Node] = {
      val ns = ArrayBuffer.empty[Node]
      var k = 0
      while (k < verts.length) {
        ns += new Node(verts(k), false)
        lists(k).sortBy(_._1).foreach { case (_, n) => ns += n }
        k += 1
      }
      val arr = ns.toIndexedSeq
      val n = arr.length
      k = 0
      while (k < n) {
        arr(k).next = arr((k + 1) % n)
        arr(k).prev = arr((k + n - 1) % n)
        k += 1
      }
      arr
    }
    val nodesA = link(a, onA)
    val nodesB = link(b, onB)

    // entry/exit by alternation from the head vertex (never on the
    // other boundary, so strictly in or out)
    def mark(nodes: IndexedSeq[Node], otherClosed: IndexedSeq[Pt],
        inv: Boolean): Unit = {
      var e = locateInRing(otherClosed, nodes.head.p) != 2
      nodes.foreach { n =>
        if (n.isInter) { n.entry = e ^ inv; e = !e }
      }
    }
    mark(nodesA, closedB, op.invSubject)
    mark(nodesB, closedA, op.invClip)

    val out = ArrayBuffer.empty[IndexedSeq[Pt]]
    val budget = (nodesA.length + nodesB.length) * 2 + 4
    nodesA.foreach { start =>
      if (start.isInter && !start.visited) {
        val ring = ArrayBuffer[Pt](start.p)
        var cur: Node = start
        var steps = 0
        var done = false
        while (!done) {
          cur.visited = true; cur.neighbor.visited = true
          var n = if (cur.entry) cur.next else cur.prev
          while (!n.isInter) {
            ring += n.p
            n = if (cur.entry) n.next else n.prev
            steps += 1
            if (steps > budget)
              refuse(op.name, "traversal failed to close")
          }
          cur = n
          if (cur == start || cur.neighbor == start) done = true
          else { ring += cur.p; cur = cur.neighbor }
          steps += 1
          if (steps > budget) refuse(op.name, "traversal failed to close")
        }
        out += (ring.toIndexedSeq :+ ring.head)
      }
    }
    Some(out.toIndexedSeq)
  }
}
