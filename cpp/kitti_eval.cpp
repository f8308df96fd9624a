// KITTI 3D object detection offline evaluator (snvc_tpu scoreboard).
//
// Fresh implementation of the official KITTI protocol as used by the
// reference (tools/kitti-eval/evaluate_object_3d_offline*.cpp):
//   * three metrics: image-plane 2D AP (+AOS), ground-plane (BEV) AP, 3D AP
//   * three difficulties: min box height {40,25,25}px, max occlusion
//     {0,1,2}, max truncation {0.15,0.3,0.5}
//   * min IoU 0.7 (car) / 0.5 (pedestrian, cyclist)
//   * 41 interpolated recall points; reports both AP|11 (every 4th point,
//     /11) and AP|R40 (points 1..40, /40)
//   * Van ignored for Car, Person_sitting for Pedestrian; DontCare areas
//     absorb otherwise-FP detections
//
// No Boost: rotated-rectangle overlap uses Sutherland-Hodgman convex
// clipping + the shoelace formula.
//
// Usage: kitti_eval GT_DIR RESULT_DIR
//   reads  GT_DIR/XXXXXX.txt and RESULT_DIR/data/XXXXXX.txt
//   writes RESULT_DIR/stats_<class>_<metric>.txt (41 precision values per
//   difficulty line) and prints one summary line per metric:
//     <class>_detection[_ground|_3d] AP11: e m h AP40: e m h

#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dirent.h>
#include <string>
#include <vector>

namespace {

constexpr int kNumSample = 41;
constexpr int kMinHeight[3] = {40, 25, 25};
constexpr int kMaxOcclusion[3] = {0, 1, 2};
constexpr double kMaxTruncation[3] = {0.15, 0.3, 0.5};
const char* kClassNames[3] = {"car", "pedestrian", "cyclist"};
// [metric][class]; official protocol values. An optional third CLI arg
// overrides the car column (diagnostic readouts at e.g. 0.5, as the
// reference ecosystem's python evaluator reports alongside 0.7).
double kMinOverlap[3][3] = {
    {0.7, 0.5, 0.5}, {0.7, 0.5, 0.5}, {0.7, 0.5, 0.5}};

struct Object {
  std::string type;
  double trunc = -1, alpha = -10;
  int occ = -1;
  double x1 = -1, y1 = -1, x2 = -1, y2 = -1;  // 2D box
  double h = 0, w = 0, l = 0;                 // dims
  double t1 = -1000, t2 = -1000, t3 = -1000;  // location (x, y, z)
  double ry = -10;
  double score = -1e9;
  bool has_score = false;
};

bool iequals(const std::string& a, const char* b) {
  return strcasecmp(a.c_str(), b) == 0;
}

std::vector<Object> loadFile(const std::string& path, bool with_score,
                             bool* ok) {
  std::vector<Object> out;
  FILE* fp = fopen(path.c_str(), "r");
  if (!fp) {
    *ok = false;
    return out;
  }
  char type[256];
  while (!feof(fp)) {
    Object o;
    double occ;
    int n = fscanf(fp, "%255s %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf",
                   type, &o.trunc, &occ, &o.alpha, &o.x1, &o.y1, &o.x2, &o.y2,
                   &o.h, &o.w, &o.l, &o.t1, &o.t2, &o.t3, &o.ry, &o.score);
    if (n >= 15) {
      o.type = type;
      o.occ = static_cast<int>(occ);
      o.has_score = (n == 16);
      out.push_back(o);
    } else if (n > 0) {
      break;  // malformed tail
    }
  }
  fclose(fp);
  *ok = true;
  return out;
}

// ---------------------------------------------------------------------------
// geometry
// ---------------------------------------------------------------------------

struct Pt {
  double x, y;
};

// BEV corners (x, z) of a box, counter-clockwise.
void bevCorners(const Object& o, Pt c[4]) {
  // the KITTI yaw rotates clockwise in the BEV (x right, z up) plane
  double cs = std::cos(o.ry), sn = std::sin(o.ry);
  double dx[4] = {o.l / 2, -o.l / 2, -o.l / 2, o.l / 2};
  double dz[4] = {o.w / 2, o.w / 2, -o.w / 2, -o.w / 2};
  for (int i = 0; i < 4; ++i) {
    c[i].x = cs * dx[i] + sn * dz[i] + o.t1;
    c[i].y = -sn * dx[i] + cs * dz[i] + o.t3;
  }
}

double polyArea(const std::vector<Pt>& p) {
  double a = 0;
  for (size_t i = 0, n = p.size(); i < n; ++i) {
    const Pt& u = p[i];
    const Pt& v = p[(i + 1) % n];
    a += u.x * v.y - v.x * u.y;
  }
  return 0.5 * a;
}

void ensureCCW(std::vector<Pt>& p) {
  if (polyArea(p) < 0) std::reverse(p.begin(), p.end());
}

// Sutherland-Hodgman: clip convex subject polygon by convex CCW clip poly.
std::vector<Pt> clipConvex(std::vector<Pt> subject, const std::vector<Pt>& clip) {
  for (size_t e = 0; e < clip.size() && !subject.empty(); ++e) {
    const Pt a = clip[e];
    const Pt b = clip[(e + 1) % clip.size()];
    auto inside = [&](const Pt& p) {
      return (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x) >= 0;
    };
    auto intersect = [&](const Pt& p, const Pt& q) {
      double A1 = b.y - a.y, B1 = a.x - b.x;
      double C1 = A1 * a.x + B1 * a.y;
      double A2 = q.y - p.y, B2 = p.x - q.x;
      double C2 = A2 * p.x + B2 * p.y;
      double det = A1 * B2 - A2 * B1;
      Pt r{0, 0};
      if (std::fabs(det) > 1e-12) {
        r.x = (B2 * C1 - B1 * C2) / det;
        r.y = (A1 * C2 - A2 * C1) / det;
      } else {
        r = p;
      }
      return r;
    };
    std::vector<Pt> out;
    for (size_t i = 0; i < subject.size(); ++i) {
      const Pt cur = subject[i];
      const Pt prev = subject[(i + subject.size() - 1) % subject.size()];
      bool cin = inside(cur), pin = inside(prev);
      if (cin) {
        if (!pin) out.push_back(intersect(prev, cur));
        out.push_back(cur);
      } else if (pin) {
        out.push_back(intersect(prev, cur));
      }
    }
    subject.swap(out);
  }
  return subject;
}

double rotatedOverlapArea(const Object& a, const Object& b) {
  Pt ca[4], cb[4];
  bevCorners(a, ca);
  bevCorners(b, cb);
  std::vector<Pt> pa(ca, ca + 4), pb(cb, cb + 4);
  ensureCCW(pa);
  ensureCCW(pb);
  std::vector<Pt> inter = clipConvex(pa, pb);
  if (inter.size() < 3) return 0.0;
  return std::fabs(polyArea(inter));
}

// criterion: -1 union, 0 wrt a, 1 wrt b (reference semantics)
double imageOverlap(const Object& a, const Object& b, int criterion) {
  double x1 = std::max(a.x1, b.x1), y1 = std::max(a.y1, b.y1);
  double x2 = std::min(a.x2, b.x2), y2 = std::min(a.y2, b.y2);
  double w = x2 - x1, h = y2 - y1;
  if (w <= 0 || h <= 0) return 0;
  double inter = w * h;
  double aa = (a.x2 - a.x1) * (a.y2 - a.y1);
  double ab = (b.x2 - b.x1) * (b.y2 - b.y1);
  if (criterion == 0) return inter / aa;
  if (criterion == 1) return inter / ab;
  return inter / (aa + ab - inter);
}

double groundOverlap(const Object& a, const Object& b, int criterion) {
  double inter = rotatedOverlapArea(a, b);
  double aa = a.l * a.w, ab = b.l * b.w;
  if (criterion == 0) return inter / aa;
  if (criterion == 1) return inter / ab;
  return inter / (aa + ab - inter);
}

double box3dOverlap(const Object& a, const Object& b, int criterion) {
  double inter_area = rotatedOverlapArea(a, b);
  double ymax = std::min(a.t2, b.t2);
  double ymin = std::max(a.t2 - a.h, b.t2 - b.h);
  double inter = inter_area * std::max(0.0, ymax - ymin);
  double va = a.h * a.w * a.l, vb = b.h * b.w * b.l;
  if (criterion == 0) return inter / va;
  if (criterion == 1) return inter / vb;
  return inter / (va + vb - inter);
}

typedef double (*OverlapFn)(const Object&, const Object&, int);

// ---------------------------------------------------------------------------
// matching / PR
// ---------------------------------------------------------------------------

struct FrameMarks {
  std::vector<int> gt;        // 0 evaluate, 1 ignore, -1 other class
  std::vector<int> det;       // same
  std::vector<int> dontcare;  // indices into gt
};

// classify gt/det of one frame for (cls, difficulty)
FrameMarks markFrame(int cls, int difficulty, const std::vector<Object>& gt,
                     const std::vector<Object>& det, int* n_gt) {
  FrameMarks m;
  for (size_t i = 0; i < gt.size(); ++i) {
    const Object& g = gt[i];
    int valid;
    if (iequals(g.type, kClassNames[cls]))
      valid = 1;
    else if (cls == 1 && iequals(g.type, "Person_sitting"))
      valid = 0;
    else if (cls == 0 && iequals(g.type, "Van"))
      valid = 0;
    else
      valid = -1;
    double height = g.y2 - g.y1;
    bool ignore = g.occ > kMaxOcclusion[difficulty] ||
                  g.trunc > kMaxTruncation[difficulty] ||
                  height < kMinHeight[difficulty];
    if (valid == 1 && !ignore) {
      m.gt.push_back(0);
      ++*n_gt;
    } else if (valid == 0 || (valid == 1 && ignore)) {
      m.gt.push_back(1);
    } else {
      m.gt.push_back(-1);
    }
    if (iequals(g.type, "DontCare")) m.dontcare.push_back(static_cast<int>(i));
  }
  for (size_t i = 0; i < det.size(); ++i) {
    double height = std::fabs(det[i].y2 - det[i].y1);
    if (height < kMinHeight[difficulty])
      m.det.push_back(1);
    else if (iequals(det[i].type, kClassNames[cls]))
      m.det.push_back(0);
    else
      m.det.push_back(-1);
  }
  return m;
}

struct Stats {
  int tp = 0, fp = 0, fn = 0;
  double similarity = 0;
  std::vector<double> scores;  // TP scores (recall-threshold pass)
};

Stats frameStats(int cls, int metric, const std::vector<Object>& gt,
                 const std::vector<Object>& det, const FrameMarks& m,
                 OverlapFn overlap, bool compute_fp, bool compute_aos,
                 double thresh) {
  constexpr double kNoDetection = -1e7;
  Stats st;
  std::vector<bool> assigned(det.size(), false);
  std::vector<bool> below(det.size(), false);
  if (compute_fp)
    for (size_t j = 0; j < det.size(); ++j)
      if (det[j].score < thresh) below[j] = true;

  std::vector<double> deltas;
  const double min_ov = kMinOverlap[metric][cls];
  for (size_t i = 0; i < gt.size(); ++i) {
    if (m.gt[i] == -1) continue;
    int det_idx = -1;
    double valid_score = kNoDetection;
    double max_overlap = 0;
    bool assigned_ignored = false;
    for (size_t j = 0; j < det.size(); ++j) {
      if (m.det[j] == -1 || assigned[j] || below[j]) continue;
      double ov = overlap(det[j], gt[i], -1);
      if (!compute_fp && ov > min_ov && det[j].score > valid_score) {
        // recall pass: highest-scoring candidate wins
        det_idx = static_cast<int>(j);
        valid_score = det[j].score;
      } else if (compute_fp && ov > min_ov &&
                 (ov > max_overlap || assigned_ignored) && m.det[j] == 0) {
        max_overlap = ov;
        det_idx = static_cast<int>(j);
        valid_score = 1;
        assigned_ignored = false;
      } else if (compute_fp && ov > min_ov && valid_score == kNoDetection &&
                 m.det[j] == 1) {
        det_idx = static_cast<int>(j);
        valid_score = 1;
        assigned_ignored = true;
      }
    }
    if (valid_score == kNoDetection && m.gt[i] == 0) {
      ++st.fn;
    } else if (valid_score != kNoDetection &&
               (m.gt[i] == 1 || m.det[det_idx] == 1)) {
      assigned[det_idx] = true;
    } else if (valid_score != kNoDetection) {
      ++st.tp;
      st.scores.push_back(det[det_idx].score);
      if (compute_aos) deltas.push_back(gt[i].alpha - det[det_idx].alpha);
      assigned[det_idx] = true;
    }
  }

  if (compute_fp) {
    for (size_t j = 0; j < det.size(); ++j)
      if (!(assigned[j] || m.det[j] == -1 || m.det[j] == 1 || below[j]))
        ++st.fp;
    // DontCare areas absorb remaining detections. Always via the 2D image
    // overlap, whatever the metric: DontCare GT rows carry placeholder 3D
    // fields (-1 dims, -1000 location), so BEV/3D overlap against them is
    // ~0 and would never absorb anything (reference
    // evaluate_object_3d_offline.cpp:582 uses boxoverlap unconditionally).
    int nstuff = 0;
    for (int dci : m.dontcare) {
      for (size_t j = 0; j < det.size(); ++j) {
        if (assigned[j] || m.det[j] == -1 || m.det[j] == 1 || below[j])
          continue;
        if (imageOverlap(det[j], gt[dci], 0) > min_ov) {
          assigned[j] = true;
          ++nstuff;
        }
      }
    }
    st.fp -= nstuff;
    if (compute_aos) {
      double sum = 0;
      for (double d : deltas) sum += (1.0 + std::cos(d)) / 2.0;
      if (st.tp > 0 || st.fp > 0)
        st.similarity = sum;  // FPs contribute 0
      else
        st.similarity = -1;
    }
  }
  return st;
}

std::vector<double> recallThresholds(std::vector<double> scores, double n_gt) {
  std::sort(scores.begin(), scores.end(), std::greater<double>());
  std::vector<double> t;
  double current = 0;
  for (size_t i = 0; i < scores.size(); ++i) {
    double l_recall = (i + 1) / n_gt;
    double r_recall = (i + 1 < scores.size()) ? (i + 2) / n_gt : l_recall;
    if ((r_recall - current) < (current - l_recall) && i + 1 < scores.size())
      continue;
    t.push_back(scores[i]);
    current += 1.0 / (kNumSample - 1.0);
  }
  return t;
}

struct ClassResult {
  std::vector<double> precision[3];  // per difficulty, kNumSample values
  std::vector<double> aos[3];
  bool has_aos = false;
};

void evalClassMetric(int cls, int metric, OverlapFn overlap, bool compute_aos,
                     const std::vector<std::vector<Object>>& gts,
                     const std::vector<std::vector<Object>>& dets,
                     ClassResult* res) {
  for (int difficulty = 0; difficulty < 3; ++difficulty) {
    int n_gt = 0;
    std::vector<FrameMarks> marks;
    std::vector<double> all_scores;
    for (size_t f = 0; f < gts.size(); ++f) {
      marks.push_back(markFrame(cls, difficulty, gts[f], dets[f], &n_gt));
      Stats s = frameStats(cls, metric, gts[f], dets[f], marks.back(),
                           overlap, false, false, 0);
      all_scores.insert(all_scores.end(), s.scores.begin(), s.scores.end());
    }
    std::vector<double> thresholds = recallThresholds(all_scores, n_gt);
    std::vector<int> tp(thresholds.size(), 0), fp(thresholds.size(), 0),
        fn(thresholds.size(), 0);
    std::vector<double> sim(thresholds.size(), 0);
    for (size_t f = 0; f < gts.size(); ++f) {
      for (size_t t = 0; t < thresholds.size(); ++t) {
        Stats s = frameStats(cls, metric, gts[f], dets[f], marks[f], overlap,
                             true, compute_aos, thresholds[t]);
        tp[t] += s.tp;
        fp[t] += s.fp;
        fn[t] += s.fn;
        if (s.similarity != -1) sim[t] += s.similarity;
      }
    }
    std::vector<double>& prec = res->precision[difficulty];
    std::vector<double>& aos = res->aos[difficulty];
    prec.assign(kNumSample, 0);
    if (compute_aos) aos.assign(kNumSample, 0);
    for (size_t t = 0; t < thresholds.size(); ++t) {
      prec[t] = tp[t] / static_cast<double>(tp[t] + fp[t]);
      if (compute_aos) aos[t] = sim[t] / (tp[t] + fp[t]);
    }
    // monotone smoothing: max over the suffix
    for (size_t t = 0; t < thresholds.size(); ++t) {
      prec[t] = *std::max_element(prec.begin() + t, prec.end());
      if (compute_aos) aos[t] = *std::max_element(aos.begin() + t, aos.end());
    }
    res->has_aos = compute_aos;
  }
}

double ap11(const std::vector<double>& p) {
  double s = 0;
  for (int i = 0; i < kNumSample; i += 4) s += p[i];
  return s / 11 * 100;
}

double ap40(const std::vector<double>& p) {
  double s = 0;
  for (int i = 1; i < kNumSample; ++i) s += p[i];
  return s / 40 * 100;
}

void report(const std::string& result_dir, const std::string& name,
            const ClassResult& r, bool aos) {
  const std::vector<double>* vals = aos ? r.aos : r.precision;
  FILE* fp = fopen((result_dir + "/stats_" + name + ".txt").c_str(), "w");
  if (fp) {
    for (int d = 0; d < 3; ++d) {
      for (double v : vals[d]) fprintf(fp, "%f ", v);
      fprintf(fp, "\n");
    }
    fclose(fp);
  }
  printf("%s AP11: %.4f %.4f %.4f AP40: %.4f %.4f %.4f\n", name.c_str(),
         ap11(vals[0]), ap11(vals[1]), ap11(vals[2]), ap40(vals[0]),
         ap40(vals[1]), ap40(vals[2]));
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 3 && argc != 4) {
    fprintf(stderr, "usage: %s GT_DIR RESULT_DIR [CAR_MIN_IOU]\n", argv[0]);
    return 1;
  }
  std::string gt_dir = argv[1], result_dir = argv[2];
  if (argc == 4) {
    double ov = atof(argv[3]);
    if (!(ov > 0.0 && ov <= 1.0)) {
      fprintf(stderr, "CAR_MIN_IOU must be in (0, 1], got %s\n", argv[3]);
      return 1;
    }
    for (int m = 0; m < 3; ++m) kMinOverlap[m][0] = ov;
  }

  // collect frame indices from RESULT_DIR/data
  std::vector<std::string> names;
  {
    DIR* dir = opendir((result_dir + "/data").c_str());
    if (!dir) {
      fprintf(stderr, "cannot open %s/data\n", result_dir.c_str());
      return 1;
    }
    while (dirent* e = readdir(dir)) {
      std::string n(e->d_name);
      if (n.size() >= 5 && n.substr(n.size() - 4) == ".txt")
        names.push_back(n);
    }
    closedir(dir);
  }
  std::sort(names.begin(), names.end());
  printf("number of files for evaluation: %d\n", static_cast<int>(names.size()));

  std::vector<std::vector<Object>> gts, dets;
  bool compute_aos = true;
  bool eval_image[3] = {false}, eval_ground[3] = {false}, eval_3d[3] = {false};
  for (const std::string& n : names) {
    bool ok1 = false, ok2 = false;
    gts.push_back(loadFile(gt_dir + "/" + n, false, &ok1));
    dets.push_back(loadFile(result_dir + "/data/" + n, true, &ok2));
    if (!ok1 || !ok2) {
      fprintf(stderr, "failed to read frame %s\n", n.c_str());
      return 1;
    }
    for (const Object& d : dets.back()) {
      if (d.alpha == -10) compute_aos = false;
      for (int c = 0; c < 3; ++c) {
        if (iequals(d.type, kClassNames[c])) {
          if (d.x1 >= 0) eval_image[c] = true;
          if (d.t1 != -1000) eval_ground[c] = true;
          if (d.t2 != -1000) eval_3d[c] = true;
        }
      }
    }
  }

  for (int c = 0; c < 3; ++c) {
    std::string cname = kClassNames[c];
    if (eval_image[c]) {
      ClassResult r;
      evalClassMetric(c, 0, imageOverlap, compute_aos, gts, dets, &r);
      report(result_dir, cname + "_detection", r, false);
      if (compute_aos) report(result_dir, cname + "_orientation", r, true);
    }
    if (eval_ground[c]) {
      ClassResult r;
      evalClassMetric(c, 1, groundOverlap, false, gts, dets, &r);
      report(result_dir, cname + "_detection_ground", r, false);
    }
    if (eval_3d[c]) {
      ClassResult r;
      evalClassMetric(c, 2, box3dOverlap, false, gts, dets, &r);
      report(result_dir, cname + "_detection_3d", r, false);
    }
  }
  return 0;
}
