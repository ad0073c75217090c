// Minimal Boost.Graph stand-in for building the REFERENCE's gam-merge
// unmodified (the image has no Boost).  Implements exactly the BGL
// subset the reference's graph layer uses (verified by grep across
// lib/src + src):
//
//   adjacency_list<setS, vecS, undirectedS|bidirectionalS, VP, EP>
//   graph_traits<G> (vertex/edge descriptors + all iterator types)
//   add_vertex, add_edge, remove_edge, edge, source, target,
//   vertices, edges, out_edges, in_edges, adjacent_vertices,
//   in_degree, out_degree, num_vertices, get/put with property tags,
//   boost::tie
//
// Semantics replicated from real BGL (these are observable in the
// reference's outputs, so they must match, not approximate):
//   * vecS vertex storage: descriptors are dense size_t indices;
//   * setS edge storage: NO parallel edges (add_edge of an existing
//     (u,v) returns {existing_edge, false}); out-edge lists iterate in
//     ASCENDING TARGET order, in-edge lists in ascending source order
//     (std::set of stored_edge ordered by the adjacent vertex);
//   * bidirectionalS edges(g): per-vertex walk in vertex order, each
//     vertex's out-edges in target order;
//   * undirectedS edges(g): the global edge list in INSERTION order
//     (BGL keeps undirected edge properties in a global list);
//   * edge properties are shared between the two directional entries
//     (put through one direction is visible through the other).
//
// Everything is value-semantic (properties keyed in per-graph maps),
// so the reference's graph copies (e.g. CompactAssemblyGraph(*ag))
// deep-copy correctly with the implicit copy constructor.

#ifndef GAM_SHIM_BOOST_ADJACENCY_LIST_HPP
#define GAM_SHIM_BOOST_ADJACENCY_LIST_HPP

#include <math.h>  // reference .cc files call ::sqrt relying on a
                   // transitive real-boost include; harmless here

#include <cstddef>
#include <list>
#include <map>
#include <set>
#include <utility>
#include <vector>

#define BOOST_INSTALL_PROPERTY(KIND, NAME) /* tag enums suffice */

namespace boost {

struct no_property {};

template <class Tag, class T, class Base = no_property>
struct property {
  typedef Tag tag_type;
  typedef T value_type;
};

struct setS {};
struct vecS {};
struct listS {};
struct undirectedS { static const bool is_directed = false; };
struct directedS { static const bool is_directed = true; };
struct bidirectionalS { static const bool is_directed = true; };

enum vertex_color_t { vertex_color };
enum vertex_index_t { vertex_index };
enum edge_weight_t { edge_weight };

namespace detail {
struct empty_value {};
template <class P> struct prop_value { typedef P type; };
template <class Tag, class T, class B>
struct prop_value< property<Tag, T, B> > { typedef T type; };
template <> struct prop_value<no_property> { typedef empty_value type; };
}  // namespace detail

template <class OEL, class VL, class Dir, class VP = no_property,
          class EP = no_property>
class adjacency_list {
 public:
  typedef std::size_t vertex_descriptor;
  typedef typename detail::prop_value<VP>::type vertex_value_t;
  typedef typename detail::prop_value<EP>::type edge_value_t;
  static const bool is_directed = Dir::is_directed;

  struct edge_descriptor {
    std::size_t s, t;
    edge_descriptor() : s(static_cast<std::size_t>(-1)), t(s) {}
    edge_descriptor(std::size_t a, std::size_t b) : s(a), t(b) {}
    bool operator==(const edge_descriptor& o) const {
      return s == o.s && t == o.t;
    }
    bool operator!=(const edge_descriptor& o) const { return !(*this == o); }
    bool operator<(const edge_descriptor& o) const {
      return s != o.s ? s < o.s : t < o.t;
    }
  };

  // ---- storage (all value-semantic) ----
  std::vector<vertex_value_t> m_vprops;
  // adjacency: per-vertex ascending neighbor map -> shared edge prop key
  std::vector< std::map<std::size_t, int> > m_out;
  std::vector< std::set<std::size_t> > m_in;  // bidirectional only
  // properties: directed keyed (s,t); undirected keyed normalized (min,max)
  std::map< std::pair<std::size_t, std::size_t>, edge_value_t > m_eprops;
  // undirected global edge list, insertion order (drives edges(g))
  std::list< std::pair<std::size_t, std::size_t> > m_ulist;

  adjacency_list() {}
  explicit adjacency_list(std::size_t n)
      : m_vprops(n), m_out(n), m_in(n) {}

  // adjacency_list::clear() — removes all vertices and edges
  // (AssemblyGraph.cc:147 calls this->clear() before rebuilding)
  void clear() {
    m_vprops.clear();
    m_out.clear();
    m_in.clear();
    m_eprops.clear();
    m_ulist.clear();
  }

  std::pair<std::size_t, std::size_t> ekey(std::size_t u,
                                           std::size_t v) const {
    if (!is_directed && v < u) return std::make_pair(v, u);
    return std::make_pair(u, v);
  }

  // ---- iterators ----
  struct vertex_iterator {
    std::size_t i;
    std::size_t operator*() const { return i; }
    vertex_iterator& operator++() { ++i; return *this; }
    vertex_iterator operator++(int) { vertex_iterator t = *this; ++i; return t; }
    bool operator==(const vertex_iterator& o) const { return i == o.i; }
    bool operator!=(const vertex_iterator& o) const { return i != o.i; }
  };

  typedef typename std::map<std::size_t, int>::const_iterator out_map_it;
  struct out_edge_iterator {
    std::size_t src;
    out_map_it it;
    edge_descriptor operator*() const { return edge_descriptor(src, it->first); }
    out_edge_iterator& operator++() { ++it; return *this; }
    out_edge_iterator operator++(int) { out_edge_iterator t = *this; ++it; return t; }
    bool operator==(const out_edge_iterator& o) const { return it == o.it; }
    bool operator!=(const out_edge_iterator& o) const { return it != o.it; }
  };

  struct in_edge_iterator {
    std::size_t tgt;
    std::set<std::size_t>::const_iterator it;
    edge_descriptor operator*() const { return edge_descriptor(*it, tgt); }
    in_edge_iterator& operator++() { ++it; return *this; }
    in_edge_iterator operator++(int) { in_edge_iterator t = *this; ++it; return t; }
    bool operator==(const in_edge_iterator& o) const { return it == o.it; }
    bool operator!=(const in_edge_iterator& o) const { return it != o.it; }
  };

  struct adjacency_iterator {
    out_map_it it;
    std::size_t operator*() const { return it->first; }
    adjacency_iterator& operator++() { ++it; return *this; }
    adjacency_iterator operator++(int) { adjacency_iterator t = *this; ++it; return t; }
    bool operator==(const adjacency_iterator& o) const { return it == o.it; }
    bool operator!=(const adjacency_iterator& o) const { return it != o.it; }
  };

  // in-neighbor iteration (PartitionFunctions.cc:70 names the type)
  struct inv_adjacency_iterator {
    std::set<std::size_t>::const_iterator it;
    std::size_t operator*() const { return *it; }
    inv_adjacency_iterator& operator++() { ++it; return *this; }
    inv_adjacency_iterator operator++(int) { inv_adjacency_iterator t = *this; ++it; return t; }
    bool operator==(const inv_adjacency_iterator& o) const { return it == o.it; }
    bool operator!=(const inv_adjacency_iterator& o) const { return it != o.it; }
  };

  // one edge_iterator type serving both directedness modes
  struct edge_iterator {
    const adjacency_list* g;
    bool undirected;
    // undirected: global list walk
    std::list< std::pair<std::size_t, std::size_t> >::const_iterator uit;
    // directed: (vertex, inner) walk
    std::size_t v;
    out_map_it inner;

    void skip_empty() {
      while (v < g->m_out.size() && inner == g->m_out[v].end()) {
        ++v;
        if (v < g->m_out.size()) inner = g->m_out[v].begin();
      }
    }
    edge_descriptor operator*() const {
      if (undirected) return edge_descriptor(uit->first, uit->second);
      return edge_descriptor(v, inner->first);
    }
    edge_iterator& operator++() {
      if (undirected) { ++uit; return *this; }
      ++inner;
      skip_empty();
      return *this;
    }
    edge_iterator operator++(int) { edge_iterator t = *this; ++(*this); return t; }
    bool operator==(const edge_iterator& o) const {
      if (undirected) return uit == o.uit;
      if (v != o.v) return false;
      if (v >= g->m_out.size()) return true;
      return inner == o.inner;
    }
    bool operator!=(const edge_iterator& o) const { return !(*this == o); }
  };
};

template <class G> struct graph_traits {
  typedef typename G::vertex_descriptor vertex_descriptor;
  typedef typename G::edge_descriptor edge_descriptor;
  typedef typename G::vertex_iterator vertex_iterator;
  typedef typename G::edge_iterator edge_iterator;
  typedef typename G::out_edge_iterator out_edge_iterator;
  typedef typename G::in_edge_iterator in_edge_iterator;
  typedef typename G::adjacency_iterator adjacency_iterator;
  typedef std::size_t vertices_size_type;
  typedef std::size_t edges_size_type;
  typedef std::size_t degree_size_type;
  static vertex_descriptor null_vertex() {
    return static_cast<vertex_descriptor>(-1);
  }
};

// ---- free functions (the reference always calls them boost::-qualified,
// with the graph as the DERIVED class; everything deduces through G) ----

template <class G>
std::size_t num_vertices(const G& g) { return g.m_out.size(); }

template <class G>
std::size_t add_vertex(G& g) {
  g.m_vprops.push_back(typename G::vertex_value_t());
  g.m_out.push_back(std::map<std::size_t, int>());
  g.m_in.push_back(std::set<std::size_t>());
  return g.m_out.size() - 1;
}

template <class G>
std::pair<typename G::edge_descriptor, bool> add_edge(std::size_t u,
                                                      std::size_t v, G& g) {
  typedef typename G::edge_descriptor ED;
  if (g.m_out[u].count(v)) return std::make_pair(ED(u, v), false);
  if (!G::is_directed && g.m_out[v].count(u))
    return std::make_pair(ED(u, v), false);
  g.m_out[u][v] = 0;
  if (G::is_directed) {
    g.m_in[v].insert(u);
  } else {
    if (u != v) g.m_out[v][u] = 0;
    g.m_ulist.push_back(std::make_pair(u, v));
  }
  g.m_eprops[g.ekey(u, v)] = typename G::edge_value_t();
  return std::make_pair(ED(u, v), true);
}

template <class G>
std::pair<typename G::edge_descriptor, bool> edge(std::size_t u,
                                                  std::size_t v, const G& g) {
  typedef typename G::edge_descriptor ED;
  bool found = g.m_out[u].count(v) != 0;
  return std::make_pair(ED(u, v), found);
}

template <class G>
void remove_edge(std::size_t u, std::size_t v, G& g) {
  if (!g.m_out[u].count(v) && !(!G::is_directed && g.m_out[v].count(u)))
    return;
  g.m_out[u].erase(v);
  if (G::is_directed) {
    g.m_in[v].erase(u);
  } else {
    g.m_out[v].erase(u);
    for (std::list< std::pair<std::size_t, std::size_t> >::iterator it =
             g.m_ulist.begin();
         it != g.m_ulist.end(); ++it) {
      if ((it->first == u && it->second == v) ||
          (it->first == v && it->second == u)) {
        g.m_ulist.erase(it);
        break;
      }
    }
  }
  g.m_eprops.erase(g.ekey(u, v));
}

template <class G>
void remove_edge(const typename G::edge_descriptor& e, G& g) {
  remove_edge(e.s, e.t, g);
}

// BGL also accepts iterators (PctgBuilder.cc:1126 remove_edge(me, g))
template <class G>
void remove_edge(const typename G::out_edge_iterator& it, G& g) {
  remove_edge(*it, g);
}
template <class G>
void remove_edge(const typename G::in_edge_iterator& it, G& g) {
  remove_edge(*it, g);
}

template <class G>
std::size_t source(const typename G::edge_descriptor& e, const G&) {
  return e.s;
}
template <class G>
std::size_t target(const typename G::edge_descriptor& e, const G&) {
  return e.t;
}

template <class G>
std::pair<typename G::vertex_iterator, typename G::vertex_iterator>
vertices(const G& g) {
  typename G::vertex_iterator b, e;
  b.i = 0;
  e.i = g.m_out.size();
  return std::make_pair(b, e);
}

template <class G>
std::pair<typename G::out_edge_iterator, typename G::out_edge_iterator>
out_edges(std::size_t v, const G& g) {
  typename G::out_edge_iterator b, e;
  b.src = e.src = v;
  b.it = g.m_out[v].begin();
  e.it = g.m_out[v].end();
  return std::make_pair(b, e);
}

template <class G>
std::pair<typename G::in_edge_iterator, typename G::in_edge_iterator>
in_edges(std::size_t v, const G& g) {
  typename G::in_edge_iterator b, e;
  b.tgt = e.tgt = v;
  b.it = g.m_in[v].begin();
  e.it = g.m_in[v].end();
  return std::make_pair(b, e);
}

template <class G>
std::pair<typename G::adjacency_iterator, typename G::adjacency_iterator>
adjacent_vertices(std::size_t v, const G& g) {
  typename G::adjacency_iterator b, e;
  b.it = g.m_out[v].begin();
  e.it = g.m_out[v].end();
  return std::make_pair(b, e);
}

template <class G>
std::size_t out_degree(std::size_t v, const G& g) {
  return g.m_out[v].size();
}

template <class G>
std::size_t in_degree(std::size_t v, const G& g) {
  return G::is_directed ? g.m_in[v].size() : g.m_out[v].size();
}

template <class G>
std::pair<typename G::edge_iterator, typename G::edge_iterator>
edges(const G& g) {
  typename G::edge_iterator b, e;
  b.g = e.g = &g;
  b.undirected = e.undirected = !G::is_directed;
  if (!G::is_directed) {
    b.uit = g.m_ulist.begin();
    e.uit = g.m_ulist.end();
  } else {
    b.v = 0;
    if (!g.m_out.empty()) b.inner = g.m_out[0].begin();
    b.skip_empty();
    e.v = g.m_out.size();
  }
  return std::make_pair(b, e);
}

// ---- property access (4-arg tagged get/put only — the sole forms the
// reference uses) ----

template <class Tag, class G>
typename G::edge_value_t get(Tag, const G& g,
                             const typename G::edge_descriptor& e) {
  typename std::map< std::pair<std::size_t, std::size_t>,
                     typename G::edge_value_t >::const_iterator it =
      g.m_eprops.find(g.ekey(e.s, e.t));
  return it != g.m_eprops.end() ? it->second : typename G::edge_value_t();
}

template <class Tag, class G>
void put(Tag, G& g, const typename G::edge_descriptor& e,
         const typename G::edge_value_t& val) {
  g.m_eprops[g.ekey(e.s, e.t)] = val;
}

template <class Tag, class G>
typename G::vertex_value_t get(Tag, const G& g, std::size_t v) {
  return g.m_vprops[v];
}

template <class Tag, class G>
void put(Tag, G& g, std::size_t v, const typename G::vertex_value_t& val) {
  g.m_vprops[v] = val;
}

// ---- boost::tie ----
template <class A, class B>
struct tie_t {
  A& a;
  B& b;
  tie_t(A& x, B& y) : a(x), b(y) {}
  template <class P>
  tie_t& operator=(const P& p) {
    a = p.first;
    b = p.second;
    return *this;
  }
};

template <class A, class B>
tie_t<A, B> tie(A& a, B& b) { return tie_t<A, B>(a, b); }

}  // namespace boost

#endif
